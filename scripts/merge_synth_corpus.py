"""Merge an extra synthetic-corpus shard into a main corpus.

The synthetic generator (`make_synthetic_3dmatch.py`) numbers scenes from
zero on every run, so growing an existing corpus with fresh scenes (new
seed) needs a key-rename union of the training pickles:

  * `3DMatch_train_{voxel:.3f}_points.pkl`  dict id -> [N, 3]
  * `3DMatch_train_{voxel:.3f}_keypts.pkl`  dict "anc@pos" -> [M, 2]

Fragment ids are `scene{s:02d}_{k}`; the shard's ids get the given prefix
(`scene` -> `{prefix}`) so they cannot collide with the main corpus (the
pair generator only pairs fragments within one scene, so the rename keeps
scene grouping intact).

Usage:
  python scripts/merge_synth_corpus.py --main data/synth3dm \
      --extra data/synth3dm_extra888 --prefix sceneC
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--main', required=True)
    ap.add_argument('--extra', required=True)
    ap.add_argument('--prefix', required=True,
                    help="replaces the leading 'scene' of the shard's "
                         'fragment ids (e.g. sceneC)')
    ap.add_argument('--split', default='train')
    ap.add_argument('--voxel', type=float, default=0.03)
    args = ap.parse_args()

    names = [f'3DMatch_{args.split}_{args.voxel:.3f}_{kind}.pkl'
             for kind in ('points', 'keypts')]

    def rename(fid):
        assert fid.startswith('scene'), fid
        return args.prefix + fid[len('scene'):]

    for name in names:
        with open(os.path.join(args.main, name), 'rb') as fh:
            main_d = pickle.load(fh)
        with open(os.path.join(args.extra, name), 'rb') as fh:
            extra_d = pickle.load(fh)
        if name.endswith('points.pkl'):
            renamed = {rename(k): v for k, v in extra_d.items()}
        else:
            renamed = {f'{rename(a)}@{rename(b)}': v
                       for k, v in extra_d.items()
                       for a, b in [k.split('@')]}
        clash = set(renamed) & set(main_d)
        if clash:
            raise SystemExit(f'{name}: {len(clash)} key collisions '
                             f'(e.g. {sorted(clash)[:3]}) — pick another '
                             f'--prefix')
        main_d.update(renamed)
        with open(os.path.join(args.main, name), 'wb') as fh:
            pickle.dump(main_d, fh)
        print(f'{name}: +{len(renamed)} -> {len(main_d)} entries')


if __name__ == '__main__':
    main()
