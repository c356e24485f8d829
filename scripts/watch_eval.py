"""Evaluate new training snapshots on the held-out eval as they appear.

Polls a training log dir; whenever a new snap-N (N >= --start, at the
--every stride) is complete, copies it + parameters.txt to a temp dir,
runs the FMR evaluation (`scripts/test_3dmatch.py` flow) and appends one
JSON line per snapshot to {log_dir}/eval_fmr.jsonl.  Checkpoint
selection policy (CLAUDE.md): pick the flagship by held-out eval, never
by step metrics.

Usage:
  python scripts/watch_eval.py --log-dir results/Log_synth_r3 \
      --data data/synth3dm [--every 2] [--start 16]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def snaps_present(log_dir):
    out = []
    if not os.path.isdir(log_dir):
        # the trainer creates its log dir only after cache build +
        # restore + first upload — a watcher started alongside the
        # trainer must idle until then, not crash
        return out
    for name in os.listdir(log_dir):
        if name.startswith('snap-'):
            try:
                out.append(int(name.split('-')[1]))
            except ValueError:
                continue
    return sorted(out)


def evaluate(log_dir, data, n, num_keypts, device_pyramid=False,
             scenes=None, batch_frags=1, eth=False):
    with tempfile.TemporaryDirectory() as tmp:
        shutil.copytree(os.path.join(log_dir, f'snap-{n}'),
                        os.path.join(tmp, f'snap-{n}'))
        shutil.copy(os.path.join(log_dir, 'parameters.txt'), tmp)
        if eth:
            # ETH-geometry snapshots: test_eth.py evaluates the synthetic
            # outdoor scenes ({data}/{scene}/gt.log) with the snapshot's
            # own geometry (same dl/KP_extent -> no rescale question)
            cmd = [sys.executable, os.path.join(REPO, 'scripts',
                                                'test_eth.py'),
                   '--data', data,
                   '--snapshot', tmp,
                   '--num-keypts', str(num_keypts),
                   # coarse buckets: 2-3 compiled programs per eval
                   # instead of ~15 (46k-97k fragments at multiple 1024)
                   '--size-multiple', '32768',
                   '--experiment',
                   f'watcheth{"dev" if device_pyramid else "host"}_snap{n}']
        else:
            cmd = [sys.executable, os.path.join(REPO, 'scripts',
                                                'test_3dmatch.py'),
               '--data', data,
               '--scenes', scenes or os.path.join(data, 'test_scenes.txt'),
               '--gt', os.path.join(data, 'gt_result'),
               '--snapshot', tmp,
               '--num-keypts', str(num_keypts),
               # tag the dump dir with the pyramid path so concurrent
               # host/device evals of one snapshot never cross-write
               '--experiment',
               f'watch{"dev" if device_pyramid else "host"}_snap{n}']
        if device_pyramid:
            # on-chip pyramids: ~10x faster extraction, fits alongside a
            # resident training pool; ONE consistent path for snapshot-
            # to-snapshot comparison (VALIDATION.md bf16 path caveat)
            cmd.append('--device-pyramid')
        if batch_frags > 1:
            cmd += ['--batch-frags', str(batch_frags)]
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3600)
    scene_stats = {}
    avg = None
    timing = {}
    for line in res.stdout.splitlines():
        if line.startswith('[timing]'):
            # '[timing] extraction X s | matching+eval Y s'
            for part in line[len('[timing]'):].split('|'):
                words = part.split()
                timing[words[0] + '_s'] = float(words[1])
        elif ': recall=' in line:
            scene, rest = line.split(': recall=')
            rec, rest2 = rest.split(' inlier_ratio=')
            scene_stats[scene] = {
                'fmr': float(rec),
                'inlier_ratio': float(rest2.split()[0])}
        elif line.startswith('average FMR'):
            avg = float(line.rsplit(' ', 1)[1])
        elif line.startswith('mean ETH FMR'):
            avg = float(line.rsplit(' ', 1)[1])
    return {'snap': n, 'fmr': avg, 'scenes': scene_stats,
            'path': 'device' if device_pyramid else 'host',
            **timing,
            'ok': res.returncode == 0,
            'err': None if res.returncode == 0 else res.stderr[-800:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--log-dir', required=True)
    ap.add_argument('--data', required=True)
    ap.add_argument('--every', type=int, default=2,
                    help='evaluate every Nth snapshot (eval contends '
                         'with training on the one chip)')
    ap.add_argument('--start', type=int, default=0)
    ap.add_argument('--num-keypts', type=int, default=250)
    ap.add_argument('--device-pyramid', action='store_true')
    ap.add_argument('--batch-frags', type=int, default=1,
                    help='fragments per XLA dispatch during the dump '
                         '(amortizes tunnel round trips ~Nx)')
    ap.add_argument('--scenes', default=None,
                    help='scene-list file overriding {data}/test_scenes.'
                         'txt — a subset keeps in-training evals cheap '
                         '(the full protocol runs once on the finalists)')
    ap.add_argument('--eth', action='store_true',
                    help='evaluate snapshots with scripts/test_eth.py '
                         '(outdoor scenes + per-scene gt.log under '
                         '--data) instead of test_3dmatch.py')
    ap.add_argument('--poll-s', type=int, default=60)
    args = ap.parse_args()

    out_path = os.path.join(args.log_dir, 'eval_fmr.jsonl')
    path = 'device' if args.device_pyramid else 'host'
    done = set()
    if os.path.exists(out_path):
        with open(out_path) as fh:
            records = [json.loads(l) for l in fh if l.strip()]
        done = {r['snap'] for r in records}
        # snapshot-to-snapshot comparison is only valid on ONE pyramid
        # path (RESULTS.md round 4: the det head's beta pole amplifies
        # cross-path ulp noise ~1e8 on degenerate rows; FMR moves 2-3
        # pairs/129 even all-f32) — refuse to mix paths in one series
        mixed = {r['path'] for r in records if 'path' in r} - {path}
        if mixed:
            sys.exit(f'{out_path} already holds {sorted(mixed)}-pyramid '
                     f'evals; refusing to append {path}-pyramid ones. '
                     f'Use a fresh log dir or rerun with the same path.')
    while True:
        present = [n for n in snaps_present(args.log_dir)
                   if n >= args.start and n % args.every == 0
                   and n not in done]
        if present:
            n = present[-1]          # newest eligible first
            t0 = time.time()
            rec = evaluate(args.log_dir, args.data, n, args.num_keypts,
                           device_pyramid=args.device_pyramid,
                           scenes=args.scenes,
                           batch_frags=args.batch_frags, eth=args.eth)
            rec['eval_s'] = round(time.time() - t0, 1)
            with open(out_path, 'a') as fh:
                fh.write(json.dumps(rec) + '\n')
            print(f'snap-{n}: FMR={rec["fmr"]} ({rec["eval_s"]}s)',
                  flush=True)
            done.add(n)
            # also pick up older skipped ones next loop if idle
        else:
            time.sleep(args.poll_s)


if __name__ == '__main__':
    main()
