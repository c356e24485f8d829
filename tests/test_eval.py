"""Tests for the evaluation stack: registration, FMR, repeatability, logs."""

import numpy as np

from d3feat_tpu.eval.benchmark_logs import load_log, write_log
from d3feat_tpu.eval.fmr import (build_correspondence, evaluate_scene_pairs,
                                 inlier_ratio_for_pair, select_top_keypoints)
from d3feat_tpu.eval.registration import (apply_transform, match_features,
                                          ransac_registration,
                                          rigid_transform_3d,
                                          rigid_transform_3d_batch,
                                          transform_error)
from d3feat_tpu.eval.repeatability import keypoint_repeatability
from d3feat_tpu.utils.icp import icp_point_to_point


def random_transform(rng, angle=0.5, shift=1.0):
    axis = rng.standard_normal(3)
    axis /= np.linalg.norm(axis)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    r = (np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k))
    t = np.eye(4)
    t[:3, :3] = r
    t[:3, 3] = rng.standard_normal(3) * shift
    return t


def test_rigid_transform_exact(rng):
    src = rng.random((50, 3)).astype(np.float64)
    t_gt = random_transform(rng)
    dst = apply_transform(src, t_gt)
    t = rigid_transform_3d(src, dst)
    np.testing.assert_allclose(t, t_gt, atol=1e-8)


def test_transform_error_identity(rng):
    t = random_transform(rng)
    rte, rre = transform_error(t, t)
    assert rte < 1e-9 and rre < 1e-4


def test_ransac_recovers_transform(rng):
    n = 200
    src = (rng.random((n, 3)) * 3).astype(np.float32)
    t_gt = random_transform(rng)
    dst = apply_transform(src, t_gt).astype(np.float32)
    # descriptors: identical for true matches + noise, 30% outliers
    desc_src = rng.standard_normal((n, 16)).astype(np.float32)
    desc_dst = desc_src + 0.01 * rng.standard_normal((n, 16)).astype(np.float32)
    outliers = rng.random(n) < 0.3
    desc_dst[outliers] = rng.standard_normal((outliers.sum(), 16))
    t_est, inliers, fitness = ransac_registration(
        src, dst, desc_src, desc_dst, distance_threshold=0.05,
        max_iters=2000, seed=1)
    rte, rre = transform_error(t_est, t_gt)
    assert rte < 0.05 and rre < 1.0, (rte, rre)
    assert fitness > 0.5


def test_batched_kabsch_matches_single(rng):
    m, k = 64, 3
    src = rng.random((m, k, 3))
    dst = rng.random((m, k, 3))
    rs, ts = rigid_transform_3d_batch(src, dst)
    for i in range(0, m, 7):
        t = rigid_transform_3d(src[i], dst[i])
        np.testing.assert_allclose(rs[i], t[:3, :3], atol=1e-9)
        np.testing.assert_allclose(ts[i], t[:3, 3], atol=1e-9)


def test_ransac_throughput_250kpt(rng):
    """The full 50k-iteration eval workload on a 250-keypoint pair must
    run in seconds (vectorized scoring), not minutes (Python loop)."""
    import time

    n = 250
    src = (rng.random((n, 3)) * 3).astype(np.float32)
    t_gt = random_transform(rng)
    dst = apply_transform(src, t_gt).astype(np.float32)
    desc = rng.standard_normal((n, 16)).astype(np.float32)
    desc_dst = desc + 0.05 * rng.standard_normal((n, 16)).astype(np.float32)
    t0 = time.perf_counter()
    t_est, _, fitness = ransac_registration(
        src, dst, desc, desc_dst, distance_threshold=0.05,
        max_iters=50000, seed=0)
    elapsed = time.perf_counter() - t0
    rte, rre = transform_error(t_est, t_gt)
    assert rte < 0.05 and rre < 1.0
    assert elapsed < 20.0, f'50k RANSAC iters took {elapsed:.1f}s'


def test_match_features_mutual(rng):
    a = rng.standard_normal((20, 8)).astype(np.float32)
    b = a[::-1].copy()  # exact reversed match
    m = match_features(a, b, mutual=True)
    assert len(m) == 20
    np.testing.assert_array_equal(m[:, 1], 19 - m[:, 0])


def test_build_correspondence_unit_desc(rng):
    a = rng.standard_normal((30, 8)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    perm = rng.permutation(30)
    b = a[perm]
    corr = build_correspondence(a, b)
    assert len(corr) == 30
    np.testing.assert_array_equal(perm[corr[:, 1]], corr[:, 0])


def test_inlier_ratio_and_fmr(rng):
    n = 100
    kp_a = (rng.random((n, 3)) * 2).astype(np.float32)
    t_gt = random_transform(rng)
    kp_b = apply_transform(kp_a, t_gt).astype(np.float32)
    desc = rng.standard_normal((n, 16)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    ratio, n_corr = inlier_ratio_for_pair(kp_a, kp_b, desc, desc, t_gt)
    assert ratio == 1.0 and n_corr == n

    frags = {0: {'keypts': kp_a, 'descriptors': desc,
                 'scores': rng.random(n)},
             1: {'keypts': kp_b, 'descriptors': desc,
                 'scores': rng.random(n)}}
    stats = evaluate_scene_pairs(frags, [(1, 0, t_gt)], num_keypts=50)
    assert stats['recall'] == 1.0


def test_select_top_keypoints(rng):
    kp = rng.random((100, 3))
    desc = rng.random((100, 8))
    scores = np.arange(100.0)
    k, d = select_top_keypoints(kp, desc, scores, 10)
    np.testing.assert_array_equal(k, kp[90:])


def test_repeatability_perfect_and_none(rng):
    kp = (rng.random((64, 3)) * 10).astype(np.float32)
    t = random_transform(rng)
    rep = keypoint_repeatability(kp, apply_transform(kp, t).astype(np.float32),
                                 t, threshold=0.1, k_sweep=(4, 64))
    assert rep[4] == 1.0 and rep[64] == 1.0
    far = kp + 100.0
    rep2 = keypoint_repeatability(kp, far.astype(np.float32), np.eye(4),
                                  threshold=0.1, k_sweep=(4,))
    assert rep2[4] == 0.0


def test_log_roundtrip(tmp_path, rng):
    t1, t2 = random_transform(rng), random_transform(rng)
    path = str(tmp_path / 'est.log')
    write_log(path, [(0, 1, 60, t1), (3, 7, 60, t2)])
    loaded = load_log(path)
    np.testing.assert_allclose(loaded['0_1'], t1, rtol=1e-6)
    np.testing.assert_allclose(loaded['3_7'], t2, rtol=1e-6)


def test_eth_fmr_end_to_end(tmp_path, rng):
    """Synthetic reference-layout dump + gt.log -> per-scene + mean FMR."""
    from d3feat_tpu.eval.eth import evaluate_eth_fmr

    scenes = ('gazebo_summer', 'wood_summer')
    out_dir = tmp_path / 'dump'
    gt_root = tmp_path / 'eth'
    n = 300
    for scene in scenes:
        base = (rng.random((n, 3)) * 5).astype(np.float32)
        desc = rng.standard_normal((n, 32)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        scores = rng.random(n)  # shared: identical top-k across fragments
        records = []
        for fid in range(3):
            if fid == 0:
                kp, t = base, np.eye(4)
            else:
                t = random_transform(rng, angle=0.4, shift=0.5)
                # dump stores keypoints in the fragment's own frame; the
                # gt transform maps fragment j onto fragment i
                kp = apply_transform(base, np.linalg.inv(t)).astype(np.float32)
                records.append((0, fid, 3, t))
            for kind, arr in (('descriptors', desc), ('keypoints', kp),
                              ('scores', scores)):
                d = out_dir / kind / scene
                d.mkdir(parents=True, exist_ok=True)
                np.save(d / f'cloud_bin_{fid}.npy', arr)
        (gt_root / scene).mkdir(parents=True)
        write_log(str(gt_root / scene / 'gt.log'), records)

    stats = evaluate_eth_fmr(str(out_dir), str(gt_root), num_keypts=100,
                             scenes=scenes, verbose=False)
    assert stats is not None
    for scene in scenes:
        assert stats[scene]['recall'] == 1.0
        assert stats[scene]['num_pairs'] == 2.0
    assert stats['__mean__']['recall'] == 1.0

    # no gt found -> None
    assert evaluate_eth_fmr(str(out_dir), str(tmp_path / 'nope'),
                            scenes=scenes, verbose=False) is None


def test_icp_refines_noisy_pose(rng):
    pts = (rng.random((2000, 3)) * np.array([4, 4, 1])).astype(np.float32)
    t_gt = random_transform(rng, angle=0.3, shift=0.5)
    dst = apply_transform(pts, t_gt).astype(np.float32)
    # perturbed initial guess
    t_init = t_gt.copy()
    t_init[:3, 3] += 0.05
    t = icp_point_to_point(pts, dst, threshold=0.2, init=t_init)
    rte, rre = transform_error(t, t_gt)
    assert rte < 0.01 and rre < 0.5


def test_nms_keypoint_selection(rng):
    from d3feat_tpu.eval.fmr import select_nms_keypoints

    # a dense cluster of top scores + a sparse field of mid scores: raw
    # top-k would take the whole cluster; NMS must keep one per radius
    cluster = (rng.random((50, 3)) * 0.02).astype(np.float32)
    field = (rng.random((500, 3)) * 10 + 1.0).astype(np.float32)
    pts = np.concatenate([cluster, field])
    desc = rng.random((len(pts), 8)).astype(np.float32)
    scores = np.concatenate([np.full(50, 10.0),
                             rng.random(500) + 1.0]).astype(np.float32)

    k, d = select_nms_keypoints(pts, desc, scores, num=20, radius=0.1)
    assert k.shape == (20, 3) and d.shape == (20, 8)
    # exactly one survivor from the 0.02-extent cluster at radius 0.1
    assert (k[:, 0] < 0.5).sum() == 1
    # survivors are pairwise >= radius apart
    dist = np.linalg.norm(k[:, None] - k[None], axis=-1)
    np.fill_diagonal(dist, 1e9)
    assert dist.min() >= 0.1

    # degenerate: fewer points than requested -> fills from suppressed
    k2, _ = select_nms_keypoints(pts[:5], desc[:5], scores[:5],
                                 num=5, radius=100.0)
    assert k2.shape == (5, 3)
