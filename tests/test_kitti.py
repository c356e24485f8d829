"""KITTI adapter tests over a synthetic odometry fixture."""

import os

import numpy as np
import pytest

from d3feat_tpu.config import kitti_config
from d3feat_tpu.data.kitti import KITTIDataset
from d3feat_tpu.eval.registration import apply_transform


@pytest.fixture(scope='module')
def kitti_root(tmp_path_factory):
    """Two-sequence synthetic KITTI layout: velodyne bins + poses + calib."""
    root = tmp_path_factory.mktemp('kitti')
    rng = np.random.default_rng(0)

    # a 'road' of points along x, the car drives 4m per frame
    world = (rng.random((60000, 3)) * np.array([200.0, 30.0, 4.0])
             - np.array([0.0, 15.0, 2.0])).astype(np.float32)

    velo2cam = np.eye(4)
    velo2cam[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]],
                                np.float32)

    for seq in (0, 8):
        vdir = root / 'sequences' / f'{seq:02d}' / 'velodyne'
        os.makedirs(vdir)
        with open(root / 'sequences' / f'{seq:02d}' / 'calib.txt', 'w') as fh:
            tr = ' '.join(str(v) for v in velo2cam[:3, :4].reshape(-1))
            fh.write('P0: 1 0 0 0 0 1 0 0 0 0 1 0\n')
            fh.write(f'Tr: {tr}\n')
        poses = []
        for frame in range(8):
            x = 4.0 * frame
            # velodyne frame: points within 50m of the car at (x, 0, 0)
            local = world - np.array([x, 0, 0], np.float32)
            sel = local[np.linalg.norm(local[:, :2], axis=1) < 50.0]
            r = np.hstack([sel, np.zeros((len(sel), 1), np.float32)])
            r.astype(np.float32).tofile(vdir / f'{frame:06d}.bin')
            # camera pose = velo2cam . T_velo . velo2cam^-1 with
            # T_velo = translation by (x, 0, 0)
            t_velo = np.eye(4)
            t_velo[0, 3] = x
            cam = velo2cam @ t_velo @ np.linalg.inv(velo2cam)
            poses.append(cam[:3].reshape(-1))
        os.makedirs(root / 'poses', exist_ok=True)
        np.savetxt(root / 'poses' / f'{seq:02d}.txt', np.asarray(poses))
    return str(root)


def test_pair_list_10m_apart(kitti_root):
    ds = KITTIDataset(kitti_root, voxel_size=0.5,
                      splits={'train': (0,), 'test': (8,)})
    pairs = ds.prepare_pairs('train')
    assert len(pairs) >= 2
    for drive, t0, t1 in pairs:
        assert drive == 0
        # the reference picks the LAST frame within 10 m (the -1 in
        # KITTI.py:104): at 4 m/frame that is t0+2 (8 m apart)
        assert (t1 - t0) == 2


def test_gt_transform_accurate_and_cached(kitti_root):
    ds = KITTIDataset(kitti_root, voxel_size=0.5,
                      splits={'train': (0,), 'test': (8,)})
    (drive, t0, t1) = ds.prepare_pairs('train')[0]
    trans = ds.gt_transform(drive, t0, t1)
    # ground truth: scan t0's frame is 4*(t1-t0) ahead in x
    want = np.eye(4)
    want[0, 3] = -4.0 * (t1 - t0)
    np.testing.assert_allclose(trans, want, atol=0.05)
    assert os.path.exists(os.path.join(ds.icp_dir, f'{drive}_{t0}_{t1}.npy'))


def test_load_pair_matches(kitti_root):
    ds = KITTIDataset(kitti_root, voxel_size=0.5,
                      splits={'train': (0,), 'test': (8,)})
    ds.prepare_pairs('train')
    loaded = ds.load_pair('train', 0)
    assert loaded is not None
    anc_t, pos, matches, trans = loaded
    assert len(matches) >= 1024
    d = np.linalg.norm(anc_t[matches[:, 0]] - pos[matches[:, 1]], axis=1)
    assert np.all(d <= ds.match_radius + 1e-5)


def test_train_batches(kitti_root, rng):
    cfg = kitti_config(max_points=65536, size_multiple=1024,
                       level_capacity_ratio=1.0, level_capacity_ratios=(),
                       keypts_num=64)
    ds = KITTIDataset(kitti_root, voxel_size=0.5,
                      splits={'train': (0,), 'test': (8,)})
    batch = next(ds.train_batches(cfg, rng))
    assert batch['corr_valid'].sum() == 64
    assert batch['trans'].shape == (4, 4)


def test_test_pairs_iterator(kitti_root):
    ds = KITTIDataset(kitti_root, voxel_size=0.5,
                      splits={'train': (0,), 'test': (8,)})
    key, anc, pos, trans = next(ds.test_pairs())
    assert key[0] == 8
    # GT aligns anc onto pos
    from scipy.spatial import cKDTree
    d, _ = cKDTree(pos).query(apply_transform(anc, trans), k=1, workers=-1)
    assert np.median(d) < 0.5


def test_icp_refinement_accuracy_with_thinning(rng):
    """Weak-spot measurement (VERDICT r1 #8): the reference refines KITTI
    GT by ICP on full-resolution clouds (`datasets/KITTI.py:288-297`);
    this adapter thins to icp_voxel=0.15 first. Measure the recovered
    pose against a KNOWN ground truth under a realistic prior error
    (KITTI odometry drift ~0.2-0.5 m): the thinned ICP must land within
    2 cm / 0.2 deg of the true pose."""
    from d3feat_tpu.ops.subsample import grid_subsample
    from d3feat_tpu.utils.icp import icp_point_to_point

    # structured LiDAR-ish scene: ground strip + wall + boxes
    n = 40000
    ground = np.stack([rng.random(n) * 60 - 30, rng.random(n) * 20 - 10,
                       rng.normal(0, 0.02, n)], 1)
    wall = np.stack([rng.random(n // 4) * 60 - 30,
                     np.full(n // 4, 8.0) + rng.normal(0, 0.02, n // 4),
                     rng.random(n // 4) * 3], 1)
    blocks = []
    for _ in range(12):
        c = np.array([rng.random() * 50 - 25, rng.random() * 14 - 7, 0.8])
        blocks.append(c + (rng.random((800, 3)) - 0.5)
                      * np.array([2.0, 2.0, 1.6]))
    scene = np.concatenate([ground, wall] + blocks).astype(np.float32)

    theta = np.deg2rad(1.5)  # prior rotation error
    c, s = np.cos(theta), np.sin(theta)
    t_true = np.eye(4)
    t_true[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    t_true[:3, 3] = [0.35, -0.2, 0.05]

    src = scene + rng.normal(0, 0.02, scene.shape)          # scan noise
    dst = apply_transform(scene, t_true) + rng.normal(0, 0.02, scene.shape)

    s0 = grid_subsample(src.astype(np.float32), 0.15)
    s1 = grid_subsample(dst.astype(np.float32), 0.15)
    # prior = identity (the full error is the prior error)
    refine = icp_point_to_point(s0, s1, threshold=0.2, max_iterations=200)

    err = np.linalg.inv(t_true) @ refine
    rte = np.linalg.norm(err[:3, 3])
    rre = np.rad2deg(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2,
                                       -1, 1)))
    assert rte < 0.02, rte
    assert rre < 0.2, rre


@pytest.mark.slow
def test_synthetic_kitti_generator_feeds_adapter(tmp_path):
    """scripts/make_synthetic_kitti.py output flows through KITTIDataset:
    >=10m pair rule (with the reference's -1 quirk), ICP-refined GT,
    >=1024 correspondences at 1.5x voxel."""
    import subprocess
    import sys as _sys
    out = str(tmp_path / 'sk')
    subprocess.run(
        [_sys.executable, 'scripts/make_synthetic_kitti.py', '--out', out,
         '--train-seqs', '1', '--val-seqs', '0', '--test-seqs', '0',
         '--frames', '6', '--length', '120'],
        check=True, cwd=os.path.dirname(os.path.dirname(__file__)))
    ds = KITTIDataset(out, voxel_size=0.30, splits={'train': (0,)})
    pairs = ds.prepare_pairs('train')
    assert pairs, 'no >=10m pairs generated'
    anc, pos, corr, trans = ds.load_pair('train', 0)
    assert corr.shape[0] >= 1024
    d = np.linalg.norm(anc[corr[:, 0]] - pos[corr[:, 1]], axis=1)
    assert d.max() <= 0.45 + 1e-6
    # GT ~8m along the drive axis after ICP refinement
    assert 6.0 < abs(trans[0, 3]) < 10.0
