"""Train D3Feat on KITTI odometry (reference entry: training_KITTI.py).

Usage:
  python scripts/train_kitti.py --data data/kitti [--save-dir ...] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/kitti')
    ap.add_argument('--save-dir', default=None)
    ap.add_argument('--epochs', type=int, default=None)
    ap.add_argument('--steps', type=int, default=None)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from d3feat_tpu.config import kitti_config
    from d3feat_tpu.data.kitti import KITTIDataset
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.train.trainer import Trainer, create_train_state

    cfg = kitti_config()
    if args.steps:
        cfg = cfg.replace(epoch_steps=args.steps)
    save_dir = args.save_dir or time.strftime('results_kitti/Log_%m%d%H%M')

    dataset = KITTIDataset(args.data, cfg.first_subsampling_dl)
    rng = np.random.default_rng(42)
    train_it = dataset.train_batches(cfg, rng, 'train')
    first = next(train_it)
    model, variables = init_kpfcnn(cfg, first['pyramid'])
    state = create_train_state(cfg, variables)

    trainer = Trainer(cfg, save_dir)
    trainer.train(
        state,
        train_batches=lambda: dataset.train_batches(cfg, rng, 'train'),
        val_batches=lambda: dataset.train_batches(
            cfg, np.random.default_rng(7), 'val'),
        num_epochs=args.epochs)


if __name__ == '__main__':
    main()
