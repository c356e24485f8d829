"""Evaluate new KITTI training snapshots (RTE/RRE/success) as they appear.

KITTI analog of `scripts/watch_eval.py`: polls a training log dir;
whenever a new snap-N (N >= --start, at the --every stride) is complete,
copies it + parameters.txt to a temp dir, runs `scripts/test_kitti.py`
over the test split and appends one JSON line per snapshot to
{log_dir}/eval_kitti.jsonl.  Success criterion is the reference's
RTE < 2 m AND RRE < 5 deg (`utils/tester.py:329-342`).

Usage:
  python scripts/watch_kitti.py --log-dir results_kitti/Log_synthk_r3 \
      --data data/synthkitti [--max-pairs 25] [--every 2] [--start 2]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def snaps_present(log_dir):
    out = []
    if not os.path.isdir(log_dir):
        # trainer creates the log dir only after cache + restore +
        # upload; a watcher started alongside it idles until then
        return out
    for name in os.listdir(log_dir):
        if name.startswith('snap-'):
            try:
                out.append(int(name.split('-')[1]))
            except ValueError:
                continue
    return sorted(out)


def evaluate(log_dir, data, n, max_pairs, device_pyramid, num_keypts):
    with tempfile.TemporaryDirectory() as tmp:
        shutil.copytree(os.path.join(log_dir, f'snap-{n}'),
                        os.path.join(tmp, f'snap-{n}'))
        shutil.copy(os.path.join(log_dir, 'parameters.txt'), tmp)
        cmd = [sys.executable, os.path.join(REPO, 'scripts',
                                            'test_kitti.py'),
               '--data', data, '--snapshot', tmp,
               '--num-keypts', str(num_keypts),
               # per-snapshot cache dir: test_kitti caches RANSAC results
               # by pair name, which must never leak across snapshots
               '--cache', os.path.join(tmp, 'cache')]
        if max_pairs:
            cmd += ['--max-pairs', str(max_pairs)]
        if device_pyramid:
            cmd.append('--device-pyramid')
        try:
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=7200)
        except subprocess.TimeoutExpired:
            # record the failure instead of killing the watcher loop —
            # later snapshots must still get evaluated
            return {'snap': n, 'success': None, 'n_pairs': None,
                    'rte_succ': None, 'rre_succ': None,
                    'ok': False, 'err': 'timeout after 7200 s'}
    rec = {'snap': n, 'success': None, 'n_pairs': None,
           'rte_succ': None, 'rre_succ': None,
           'ok': res.returncode == 0,
           'err': None if res.returncode == 0 else res.stderr[-800:]}
    m = re.search(r'success rate: ([\d.]+) \((\d+)/(\d+)\)', res.stdout)
    if m:
        rec['success'] = float(m.group(1))
        rec['n_pairs'] = int(m.group(3))
    m = re.search(r'RTE \(successes\): ([\d.]+) m', res.stdout)
    if m:
        rec['rte_succ'] = float(m.group(1))
    m = re.search(r'RRE \(successes\): ([\d.]+) deg', res.stdout)
    if m:
        rec['rre_succ'] = float(m.group(1))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--log-dir', required=True)
    ap.add_argument('--data', required=True)
    ap.add_argument('--every', type=int, default=2)
    ap.add_argument('--start', type=int, default=0)
    ap.add_argument('--max-pairs', type=int, default=25,
                    help='pairs per in-training eval (full 55-pair table '
                         'runs once on the finalists)')
    ap.add_argument('--num-keypts', type=int, default=250)
    ap.add_argument('--device-pyramid', action='store_true')
    ap.add_argument('--poll-s', type=int, default=60)
    args = ap.parse_args()

    out_path = os.path.join(args.log_dir, 'eval_kitti.jsonl')
    done = set()
    if os.path.exists(out_path):
        with open(out_path) as fh:
            done = {json.loads(l)['snap'] for l in fh if l.strip()}
    while True:
        present = [n for n in snaps_present(args.log_dir)
                   if n >= args.start and n % args.every == 0
                   and n not in done]
        if present:
            n = present[-1]
            t0 = time.time()
            rec = evaluate(args.log_dir, args.data, n, args.max_pairs,
                           args.device_pyramid, args.num_keypts)
            rec['eval_s'] = round(time.time() - t0, 1)
            with open(out_path, 'a') as fh:
                fh.write(json.dumps(rec) + '\n')
            print(f'snap-{n}: success={rec["success"]} '
                  f'rte={rec["rte_succ"]} rre={rec["rre_succ"]} '
                  f'({rec["eval_s"]}s)', flush=True)
            done.add(n)
        else:
            time.sleep(args.poll_s)


if __name__ == '__main__':
    main()
