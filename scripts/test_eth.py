"""ETH zero-shot generalization test (reference entry: test_eth.py).

A 3DMatch-trained model is applied to outdoor laser scans with rescaled
geometry: first_subsampling_dl=0.05, KP_extent=2.0 (`test_eth.py:37-39`),
i.e. the kernel geometry is stretched to the coarser voxel while the
trained weights are reused. Dumps the reference output layout, then — when
per-scene `gt.log` files are present (they ship with the ETH dataset,
`{data}/{scene}/gt.log`) — computes per-scene and mean FMR exactly as the
reference's `geometric_registration_eth/evaluate_eth.py:113-177`
(num_keypts=250, tau1=0.10 m, tau2=0.05).

Usage:
  python scripts/test_eth.py --data data/ETH --snapshot results/Log_X
                             [--gt data/ETH] [--num-keypts 250] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/ETH')
    ap.add_argument('--device-pyramid', action='store_true',
                    help='build the multiscale pyramid on the accelerator\n'
                         '(data/pyramid_device.py) instead of the host')
    ap.add_argument('--snapshot', default=None)
    ap.add_argument('--out', default='geometric_registration_eth')
    ap.add_argument('--experiment', default='tpu-eth')
    ap.add_argument('--gt', default=None,
                    help='dir with {scene}/gt.log (defaults to --data; the '
                         'ETH download ships gt.log next to the .ply '
                         'fragments)')
    ap.add_argument('--num-keypts', type=int, default=250)
    ap.add_argument('--neighborhood-limits', default=None,
                    help='comma-separated per-level K_l overriding the '
                         'trained config (ETH outdoor neighborhoods at '
                         'KP_extent 2.0 are far denser than indoor — '
                         'calibrate with scripts/dataset_stats.py on an '
                         'ETH-geometry corpus)')
    ap.add_argument('--level-capacity-ratios', default=None,
                    help='comma-separated per-level capacity ratios '
                         '(outdoor 2.5D scans subsample less per octave '
                         'than indoor; the 3DMatch ratios overflow and '
                         'force the wide-bucket fallback program)')
    ap.add_argument('--size-multiple', type=int, default=None,
                    help='override config.size_multiple for the fragment '
                         'bucketing. ETH fragments span 46k-97k points — '
                         'at the default 1024 they scatter over ~15 '
                         'buckets and every bucket is a fresh 1-2 min XLA '
                         'compile; 32768 collapses them to 2-3 programs '
                         '(padding costs ~ms of forward compute)')
    ap.add_argument('--rescale-kpoints', action='store_true',
                    help='DEVIATION: multiply the restored kernel-point '
                         'dispositions by the KP_extent*dl ratio so the '
                         'kernel geometry matches the rescaled ETH '
                         'neighborhoods. Default off = reference parity: '
                         'the reference Saver restores TRAINED-scale '
                         'dispositions (kernel_points.py:181 stores '
                         'physical units; tester.py:143-162 restores '
                         'them; a rescale op at tester.py:164-168 is '
                         'commented out)')
    ap.add_argument('--exact', action='store_true',
                    help='bit-stable eval: all-f32 forward + f32 head')
    ap.add_argument('--batch-frags', type=int, default=1,
                    help='fragments per XLA dispatch (extract_many)')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from d3feat_tpu.config import Config, eth_test_config
    from d3feat_tpu.data.eth import ETHDataset
    from d3feat_tpu.models.kpfcnn import init_variables
    from d3feat_tpu.runtime import DescriptorExtractor, generate_descriptors
    from d3feat_tpu.train.trainer import create_train_state

    cfg = eth_test_config()
    if args.snapshot:
        trained = Config.load(os.path.join(args.snapshot, 'parameters.txt'))
        cfg = trained.replace(dataset='ETH', first_subsampling_dl=0.05,
                              KP_extent=2.0)

    if args.neighborhood_limits:
        cfg = cfg.replace(neighborhood_limits=tuple(
            int(k) for k in args.neighborhood_limits.split(',')))
    if args.level_capacity_ratios:
        cfg = cfg.replace(level_capacity_ratios=tuple(
            float(r) for r in args.level_capacity_ratios.split(',')))

    if args.exact:
        cfg = cfg.replace(compute_dtype='float32', score_dtype='float32')
    if args.size_multiple:
        cfg = cfg.replace(size_multiple=args.size_multiple)

    dataset = ETHDataset(args.data, 0.0625)
    variables = init_variables(cfg)
    if args.snapshot:
        from d3feat_tpu.utils.checkpoint import (latest_snapshot,
                                                 restore_checkpoint)
        from d3feat_tpu.utils.checkpoint import rescale_kpoints
        state = restore_checkpoint(latest_snapshot(args.snapshot),
                                   create_train_state(cfg, variables))
        # Reference parity: the Saver restores TRAINED-scale dispositions
        # into the rescaled-geometry graph (tester.py:143-162); the
        # --rescale-kpoints deviation stretches them to the target
        # KP_extent*dl instead (see utils/checkpoint.rescale_kpoints).
        kpts = state.kpoints
        if args.rescale_kpoints:
            kpts = rescale_kpoints(state.kpoints, trained, cfg)
            print('DEVIATION: kernel dispositions rescaled to ETH geometry')
        else:
            print('reference parity: trained-scale kernel dispositions')
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats,
                     'kpoints': kpts}

    extractor = DescriptorExtractor(cfg, variables,
                                    device_pyramid=args.device_pyramid)
    out_dir = generate_descriptors(extractor, dataset.test_fragments(),
                                   args.out, args.experiment,
                                   batch_frags=args.batch_frags)
    print(f'dumped ETH descriptors under {out_dir}')

    from d3feat_tpu.eval.eth import evaluate_eth_fmr
    gt_root = args.gt or args.data
    evaluate_eth_fmr(out_dir, gt_root, num_keypts=args.num_keypts)


if __name__ == '__main__':
    main()
