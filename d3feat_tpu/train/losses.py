"""Descriptor/detector losses (JAX, padding-aware).

Re-expression of `utils/loss.py` (reference) over fixed-size correspondence
sets with a validity mask. The reference samples exactly ``keypts_num``
correspondences with replacement (`datasets/ThreeDMatch.py:225-229`); here
shorter sets are padded and masked, which also subsumes the reference's
"skip batch if fewer than keypts_num/2 correspondences" `tf.cond`
(`models/KPFCNN_model.py:172-186`) as a `where` on the final loss.

Identity structure: correspondence i of the anchor matches correspondence i
of the positive (positiveIDS = range, `models/KPFCNN_model.py:147-149`), so
the positive mask is the identity matrix and "furthest positive" is the
diagonal of the distance matrix.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

_BIG = 1e5      # masking constant for min() (utils/loss.py:108)
_HUGE = 1e8     # masking constant inside LSE (utils/loss.py:175)


def cdist(a: jax.Array, b: jax.Array, metric: str = 'euclidean') -> jax.Array:
    """Pairwise distances [B1, B2] (`utils/loss.py:35-67`; euclidean adds
    1e-12 under the sqrt so the gradient at zero is defined)."""
    diffs = a[:, None, :] - b[None, :, :]
    if metric == 'sqeuclidean':
        return jnp.sum(jnp.square(diffs), axis=-1)
    if metric == 'euclidean':
        return jnp.sqrt(jnp.sum(jnp.square(diffs), axis=-1) + 1e-12)
    if metric == 'cityblock':
        return jnp.sum(jnp.abs(diffs), axis=-1)
    raise ValueError(f'unknown metric: {metric}')


def _hardest_stats(dists, valid, false_negative_mask):
    """Shared batch-hard mining (`utils/loss.py:97-119,141-154`).

    Returns (furthest_positive, closest_negative, accuracy, mean_pos,
    mean_neg) with pad rows/cols neutralized.
    """
    n = dists.shape[0]
    eye = jnp.eye(n, dtype=bool)
    col_invalid = ~valid[None, :]

    # positives: the diagonal (one positive per row)
    furthest_positive = jnp.diagonal(dists)

    # negatives: off-diagonal, not false-negative, valid column
    neg_mask_bad = eye | col_invalid
    if false_negative_mask is not None:
        neg_mask_bad = neg_mask_bad | false_negative_mask
    closest_negative = jnp.min(dists + _BIG * neg_mask_bad.astype(dists.dtype),
                               axis=1)

    diff = furthest_positive - closest_negative
    n_valid = jnp.maximum(jnp.sum(valid.astype(dists.dtype)), 1.0)
    accuracy = jnp.sum((diff <= 0.0) & valid) / n_valid

    mean_pos = jnp.sum(furthest_positive * valid) / n_valid
    # reference's average_negative keeps false negatives in the mean and
    # rescales by n/(n-1) (utils/loss.py:116) — monitoring only
    neg_monitor = ~(eye | col_invalid) & valid[:, None]
    if false_negative_mask is not None:
        neg_monitor = neg_monitor & ~false_negative_mask
    denom = jnp.maximum(jnp.sum(neg_monitor.astype(dists.dtype)), 1.0)
    mean_neg = jnp.sum(dists * neg_monitor) / denom
    return furthest_positive, closest_negative, accuracy, mean_pos, mean_neg


def contrastive_loss(
    dists: jax.Array,
    valid: jax.Array,
    false_negative_mask: Optional[jax.Array] = None,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
) -> Dict[str, jax.Array]:
    """Batch-hard contrastive loss (`utils/loss.py:83-123`)."""
    fp, cn, acc, mp, mn = _hardest_stats(dists, valid, false_negative_mask)
    per_row = (jnp.maximum(fp - pos_margin, 0.0)
               + jnp.maximum(neg_margin - cn, 0.0))
    n_valid = jnp.maximum(jnp.sum(valid.astype(dists.dtype)), 1.0)
    loss = jnp.sum(per_row * valid) / n_valid
    return {'loss': loss, 'accuracy': acc, 'd_pos': mp, 'd_neg': mn}


def circle_loss(
    dists: jax.Array,
    valid: jax.Array,
    false_negative_mask: Optional[jax.Array] = None,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
    log_scale: float = 25.0,
) -> Dict[str, jax.Array]:
    """Distance-based circle loss (`utils/loss.py:126-182`), the default
    hard-wired training loss (`models/KPFCNN_model.py:157-161`)."""
    n = dists.shape[0]
    eye = jnp.eye(n, dtype=bool)
    fp, cn, acc, mp, mn = _hardest_stats(dists, valid, false_negative_mask)

    # single positive per row => LSE over positives collapses to the diag
    lse_positive = log_scale * (fp - pos_margin)

    # The reference masks positives/false-negatives by adding 1e8 to the
    # distance (utils/loss.py:175); the circle weight then clamps to 0 so
    # each masked entry contributes exp(0) = 1 to the LSE sum — a quirk we
    # reproduce. Pad columns, which don't exist in the reference, must
    # contribute 0 instead (-inf), keeping the loss padding-invariant.
    ref_masked = eye
    if false_negative_mask is not None:
        ref_masked = ref_masked | false_negative_mask
    neg = dists + _HUGE * ref_masked.astype(dists.dtype)
    weight = jnp.maximum(0.0, jax.lax.stop_gradient(neg_margin - neg))
    lse_in = log_scale * (neg_margin - neg) * weight
    lse_in = jnp.where(valid[None, :], lse_in, -jnp.inf)
    lse_negative = jax.scipy.special.logsumexp(lse_in, axis=-1)

    per_row = jax.nn.softplus(lse_positive + lse_negative) / log_scale
    n_valid = jnp.maximum(jnp.sum(valid.astype(dists.dtype)), 1.0)
    loss = jnp.sum(per_row * valid) / n_valid
    return {'loss': loss, 'accuracy': acc, 'd_pos': mp, 'd_neg': mn}


def det_loss(
    dists: jax.Array,
    score_anc: jax.Array,
    score_pos: jax.Array,
    valid: jax.Array,
    false_negative_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Detector ranking loss (`utils/loss.py:185-195`): push scores up where
    the descriptor already discriminates. NOTE: the reference's det_loss
    does NOT apply the false-negative mask to closest_negative — only the
    identity mask (`utils/loss.py:190`); replicated here by default
    (pass the mask explicitly to deviate)."""
    n = dists.shape[0]
    eye = jnp.eye(n, dtype=bool)
    fp = jnp.diagonal(dists)
    bad = eye | (~valid[None, :])
    if false_negative_mask is not None:
        bad = bad | false_negative_mask
    cn = jnp.min(dists + _BIG * bad.astype(dists.dtype), axis=1)
    per_row = (fp - cn) * (score_anc[:, 0] + score_pos[:, 0] + 1e-6)
    n_valid = jnp.maximum(jnp.sum(valid.astype(dists.dtype)), 1.0)
    return jnp.sum(per_row * valid) / n_valid


def d3feat_loss(
    desc_anc: jax.Array,       # [M, D] anchor descriptors at correspondences
    desc_pos: jax.Array,       # [M, D] positive descriptors
    score_anc: jax.Array,      # [M, 1]
    score_pos: jax.Array,      # [M, 1]
    keypts_dists: jax.Array,   # [M, M] spatial distances between anchor kpts
    valid: jax.Array,          # [M] bool correspondence validity
    *,
    safe_radius: float,
    pos_margin: float,
    neg_margin: float,
    log_scale: float,
    det_weight: float,
    keypts_num: int,
    loss_type: str = 'circle_loss',
) -> Dict[str, jax.Array]:
    """Full D3Feat training loss (`models/KPFCNN_model.py:143-186`):
    descriptor loss + weighted detector loss, with the false-negative mask
    from keypoint spatial proximity and the too-few-correspondences skip."""
    dists = cdist(desc_anc, desc_pos)
    eye = jnp.eye(dists.shape[0], dtype=bool)
    false_neg = (keypts_dists < safe_radius) & ~eye

    if loss_type == 'circle_loss':
        desc = circle_loss(dists, valid, false_neg, pos_margin, neg_margin,
                           log_scale)
    elif loss_type == 'contrastive':
        desc = contrastive_loss(dists, valid, false_neg, pos_margin,
                                neg_margin)
    else:
        raise ValueError(f'unknown loss_type: {loss_type}')

    det = det_weight * det_loss(dists, score_anc, score_pos, valid)

    # skip batch when correspondences < keypts_num/2 (KPFCNN_model.py:172-186)
    enough = jnp.sum(valid.astype(jnp.float32)) >= 0.5 * keypts_num
    out = {
        'desc_loss': jnp.where(enough, desc['loss'], 0.0),
        'det_loss': jnp.where(enough, det, 0.0),
        'accuracy': jnp.where(enough, desc['accuracy'], -1.0),
        'd_pos': jnp.where(enough, desc['d_pos'], 0.0),
        'd_neg': jnp.where(enough, desc['d_neg'], 0.0),
    }
    out['loss'] = out['desc_loss'] + out['det_loss']
    return out
