"""Quantify detection-score ordering sensitivity at the keypoint cut.

Round-2 finding (VALIDATION.md): host- and device-pyramid extraction
agree to 3e-6 in f32 but produce different FMR samples under bf16
because the top-250 score cut amplifies accumulation-order noise.  This
script measures exactly that: given two descriptor dumps of the SAME
fragments (`runtime.generate_descriptors` layout — e.g. bf16 vs f32
head, or host vs device pyramid), it reports per fragment

  * the top-k keypoint set overlap between the two runs;
  * the relative score margin at the cut, margin = (s[k-1] - s[k])
    / s[k-1], for each run (how thin the ordering is at rank k);
  * how many rank flips land within a bf16-ulp band of the cut.

Usage:
  python scripts/score_margin_study.py --a geometric_registration/D3Feat_x \
      --b geometric_registration/D3Feat_y [--num-keypts 250]
"""

import argparse
import os

import numpy as np


def fragments(dump):
    for scene in sorted(os.listdir(os.path.join(dump, 'scores'))):
        sdir = os.path.join(dump, 'scores', scene)
        for f in sorted(os.listdir(sdir)):
            yield scene, f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--a', required=True)
    ap.add_argument('--b', required=True)
    ap.add_argument('--num-keypts', type=int, default=250)
    args = ap.parse_args()
    k = args.num_keypts

    overlaps, margins_a, flip_band = [], [], []
    for scene, f in fragments(args.a):
        sa = np.load(os.path.join(args.a, 'scores', scene, f))
        sb_path = os.path.join(args.b, 'scores', scene, f)
        if not os.path.exists(sb_path):
            continue
        sb = np.load(sb_path)
        ka = np.load(os.path.join(args.a, 'keypoints', scene, f))
        kb = np.load(os.path.join(args.b, 'keypoints', scene, f))
        # dumps are score-ascending: top-k = last k rows; identify
        # keypoints by coordinates (the point sets are identical, only
        # the ordering differs)
        top_a = {tuple(np.round(p, 6)) for p in ka[-k:]}
        top_b = {tuple(np.round(p, 6)) for p in kb[-k:]}
        ov = len(top_a & top_b) / k
        overlaps.append(ov)
        cut = sa[-k]
        prev = sa[-k - 1] if len(sa) > k else cut
        margins_a.append((cut - prev) / max(cut, 1e-12))
        # bf16 has ~8 mantissa bits: relative ulp ~ 2^-8
        band = cut * 2.0 ** -8
        flip_band.append(int(np.sum(np.abs(sa - cut) < band)))
        print(f'{scene}/{f}: overlap {ov:.3f} '
              f'cut-margin {margins_a[-1]:.2e} '
              f'pts-within-bf16-ulp-of-cut {flip_band[-1]}')
    print(f'\nmean top-{k} overlap: {np.mean(overlaps):.4f} '
          f'(min {np.min(overlaps):.4f})')
    print(f'median relative margin at the cut: {np.median(margins_a):.2e}')
    print(f'median points within one bf16 ulp of the cut: '
          f'{np.median(flip_band):.0f}')


if __name__ == '__main__':
    main()
