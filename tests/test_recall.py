"""Registration-recall protocol tests, including against the real gt files
committed in the reference repo."""

import os

import numpy as np
import pytest

from d3feat_tpu.eval.benchmark_logs import load_log
from d3feat_tpu.eval.recall import (_dcm_to_quat, load_info,
                                    registration_recall,
                                    transformation_error)

GT_ROOT = os.path.join(os.path.dirname(__file__), '..', 'data', 'gt_result',
                       '7-scenes-redkitchen-evaluation')


def test_identity_error_is_zero():
    info = np.eye(6) * 100.0
    assert transformation_error(np.eye(4), info) == 0.0


def test_error_scales_with_translation():
    info = np.eye(6) * 50.0
    t = np.eye(4)
    t[0, 3] = 0.1
    p1 = transformation_error(t, info)
    t[0, 3] = 0.2
    p2 = transformation_error(t, info)
    # p = ||t||^2 (info proportional to identity cancels)
    np.testing.assert_allclose(p1, 0.01, rtol=1e-6)
    np.testing.assert_allclose(p2, 0.04, rtol=1e-6)


def test_against_reference_gt_files():
    """Feeding the GT transforms back as estimates must give recall 1.0 on
    the committed reference gt.log/gt.info."""
    if not os.path.isdir(GT_ROOT):
        pytest.skip('reference gt_result unavailable')
    gt = load_log(os.path.join(GT_ROOT, 'gt.log'))
    info = load_info(os.path.join(GT_ROOT, 'gt.info'))
    assert len(gt) > 100
    assert set(info).issuperset(set(gt))
    stats = registration_recall(gt, gt, info)
    assert stats['recall'] == 1.0
    assert stats['precision'] == 1.0
    assert stats['mean_error'] < 1e-10

    # perturb translations by 0.5 m -> every pair fails the 0.04 threshold
    bad = {k: t.copy() for k, t in gt.items()}
    for t in bad.values():
        t[:3, 3] += 0.5
    stats_bad = registration_recall(bad, gt, info)
    assert stats_bad['recall'] < 0.05


def test_dcm_to_quat_all_branches():
    """4-branch construction vs scipy, including ~180-degree rotations
    (trace ~ -1) where the w-only formula is numerically garbage."""
    from scipy.spatial.transform import Rotation

    cases = [Rotation.from_euler('xyz', e, degrees=True) for e in [
        (10, 20, 30),          # w-dominant branch
        (179.9, 0, 0),         # x-dominant (near-180 about x)
        (0, 179.95, 0),        # y-dominant
        (0, 0, 180.0),         # z-dominant (exactly 180)
        (178, 30, -40),
    ]]
    rng = np.random.default_rng(3)
    cases += [Rotation.random(random_state=rng) for _ in range(20)]
    for rot in cases:
        r = rot.as_matrix()
        q = _dcm_to_quat(r)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)
        # MATLAB dcm2quat = conjugate of the rotation quaternion
        x, y, z, w = rot.as_quat()
        expect = np.array([w, -x, -y, -z])
        if expect[0] < 0:
            expect = -expect
        np.testing.assert_allclose(q, expect, atol=1e-7)


def test_near_180_rotation_error_finite_and_large():
    """A 180-degree wrong estimate must yield a large, finite error."""
    from scipy.spatial.transform import Rotation

    delta = np.eye(4)
    delta[:3, :3] = Rotation.from_euler('x', 179.99, degrees=True).as_matrix()
    p = transformation_error(delta, np.eye(6) * 100.0)
    assert np.isfinite(p)
    assert p > ERR2_LARGE


ERR2_LARGE = 0.5  # far above the 0.04 acceptance threshold


def test_adjacent_pairs_excluded():
    gt = {'0_1': np.eye(4), '0_3': np.eye(4)}
    info = {'0_1': (10, np.eye(6)), '0_3': (10, np.eye(6))}
    stats = registration_recall(gt, gt, info)
    assert stats['gt_num'] == 1.0  # only the non-adjacent 0_3
    assert stats['recall'] == 1.0
