"""Neighbor search kernels: dense matmul-shaped distance work for the MXU.

TPU-native replacements for three CUDA dependencies of the reference:

- ``nearest_neighbor`` / ``mutual_nearest``: 1-NN + mutual filtering over
  descriptor sets, replacing ``KNN_CUDA`` (``models/BUFFERX.py:469-496``).
  Distances are a rank-2k matmul (MXU) plus row/col argmin (VPU).
- ``ball_query``: fixed-capacity "random subset within radius" selection,
  replacing ``pointnet2_ops.ball_query + grouping_operation``
  (``models/patch_embedder.py:92-120``). The reference shuffles the cloud
  and keeps the first ``nsample`` in-radius points per center — i.e. a
  uniform random in-radius subset. We reproduce that distribution directly:
  score every point with uniform noise, mask out-of-radius points to -inf,
  and take a top-k over the scores. On TPU the top-k runs as
  ``lax.approx_max_k`` (bitonic, near bandwidth speed); elsewhere exact
  ``lax.top_k``.

Mutual matching keeps a *fixed-size* correspondence set: every source slot
keeps its nearest target plus a ``mutual`` validity bit — no dynamic
compaction, so everything downstream stays statically shaped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "sqdist",
    "masked_sqdist",
    "nearest_neighbor",
    "mutual_nearest",
    "ball_query",
    "ball_query_blocks",
    "ball_query_stratified",
]

_BIG = jnp.float32(1e30)


def sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances [..., M, N] between [..., M, D], [..., N, D].

    Matmul-shaped so XLA can tile it onto the MXU; f32 accumulation is pinned
    (bf16 inputs would corrupt centimeter-scale geometry).
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    ab = jnp.einsum(
        "...md,...nd->...mn", a, b, precision=jax.lax.Precision.HIGHEST
    )
    d = a2 - 2.0 * ab + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d, 0.0)


def sqdist_compensated(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``sqdist`` via ONE bf16 hi/lo-compensated MXU pass.

    The HIGHEST-precision f32 einsum in :func:`sqdist` runs as a 6-pass
    bf16 decomposition on the TPU MXU; for centimeter-scale GEOMETRY the
    compensated single pass is enough: both operands split into bf16
    hi/lo halves stacked along the contraction
    (``[a_hi, a_hi, a_lo] . [b_hi; b_lo; b_hi]``), every partial product
    is exact in the f32 accumulator (8-bit mantissa products fit f32),
    and only the ``lo*lo`` term is dropped — |error| <= 2^-16 |a||b|,
    i.e. ~0.2 mm at radius 0.3 m on room-scale clouds. Descriptor
    matching keeps the HIGHEST path (:func:`mutual_nearest`): mutual-NN
    ties care about exact distance ordering.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    A = jnp.concatenate([a_hi, a_hi, a_lo], axis=-1)
    B = jnp.concatenate([b_hi, b_lo, b_hi], axis=-1)
    ab = jnp.einsum(
        "...md,...nd->...mn", A, B, preferred_element_type=jnp.float32
    )
    d = a2 - 2.0 * ab + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d, 0.0)


def masked_sqdist(
    a: jnp.ndarray,
    b: jnp.ndarray,
    mask_a: jnp.ndarray,
    mask_b: jnp.ndarray,
    fill: float = _BIG,
    precise: bool = True,
) -> jnp.ndarray:
    """``sqdist`` with invalid rows/cols pushed to ``fill``.

    ``precise=False`` uses the compensated one-pass bf16 path
    (:func:`sqdist_compensated`) — the geometry d2 matrices in the
    serving pipeline take it; descriptor matching keeps the default."""
    d = sqdist(a, b) if precise else sqdist_compensated(a, b)
    valid = mask_a[..., :, None] & mask_b[..., None, :]
    return jnp.where(valid, d, fill)


def nearest_neighbor(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    mask_query: jnp.ndarray | None = None,
    mask_ref: jnp.ndarray | None = None,
):
    """1-NN of each query among valid refs: returns (idx [M], dist2 [M])."""
    if mask_query is None:
        mask_query = jnp.ones(query.shape[:-1], bool)
    if mask_ref is None:
        mask_ref = jnp.ones(ref.shape[:-1], bool)
    d = masked_sqdist(query, ref, mask_query, mask_ref)
    idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    return idx, jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]


def mutual_nearest(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    mask_a: jnp.ndarray,
    mask_b: jnp.ndarray,
):
    """Mutual 1-NN correspondences, fixed size.

    Returns (nn_ab [M] int32, mutual [M] bool, nn_d2 [M] f32): slot i
    corresponds (a_i, b_{nn_ab[i]}), ``mutual[i]`` says the relation is
    reciprocal (and both endpoints valid), and ``nn_d2`` is the squared
    descriptor distance of the match (useful for confidence-ranking the
    solver's sampling pool). Mirrors ``BufferX.mutual_matching``
    (``models/BUFFERX.py:469-496``) without dynamic compaction.
    """
    d = masked_sqdist(desc_a, desc_b, mask_a, mask_b)
    nn_ab = jnp.argmin(d, axis=-1).astype(jnp.int32)   # [M]
    nn_ba = jnp.argmin(d, axis=-2).astype(jnp.int32)   # [N]
    m = nn_ba[nn_ab] == jnp.arange(desc_a.shape[0], dtype=jnp.int32)
    mutual = m & mask_a & mask_b[nn_ab]
    nn_d2 = jnp.take_along_axis(d, nn_ab[:, None], axis=-1)[:, 0]
    return nn_ab, mutual, nn_d2


def _random_topk(scores: jnp.ndarray, k: int, use_approx: bool):
    if use_approx:
        # Scores are *random priorities*: we want any k of the positive-score
        # candidates, not exact top-k, so a low recall target is free — it
        # only reshuffles which random subset wins, while shrinking the
        # intermediate candidate set approx_max_k sorts (recall 0.95 left a
        # 15k-wide aggregate sort per row at production shapes).
        vals, idx = jax.lax.approx_max_k(scores, k, recall_target=0.5)
    else:
        vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("nsample", "use_approx"))
def ball_query(
    pts: jnp.ndarray,
    pts_mask: jnp.ndarray,
    centers: jnp.ndarray,
    radius: jnp.ndarray,
    key: jax.Array,
    nsample: int,
    use_approx: bool = True,
    d2: jnp.ndarray | None = None,
):
    """Uniform random in-radius subset of size ``nsample`` per center.

    pts: [N, 3] (+ mask [N]); centers: [K, 3]; radius: scalar (may be traced).
    ``d2`` optionally supplies the precomputed [K, N] squared distances —
    the pipeline shares one matrix between radius estimation and every
    scale's patch extraction (the [K, N] build is the single most expensive
    dense pass at production shapes).
    Returns (idx [K, nsample] int32, valid [K, nsample] bool). Invalid slots
    point at index 0 and must be masked by callers (the patch pipeline
    substitutes the center's own coordinates, matching the reference's
    empty-slot handling at ``models/patch_embedder.py:105-111``).

    Selection priority is a per-center random *cyclic shift* of the point
    order. Points arrive pre-shuffled (``prepare_cloud`` / the loaders), and
    a cyclic shift of a uniform random permutation is again uniform, so the
    selected subset has the reference's shuffle-once-then-ball-query
    distribution (``patch_embedder.py:99-104``) — while costing one iota
    instead of a [K, N] Threefry draw.
    """
    k = centers.shape[0]
    n = pts.shape[0]
    if d2 is None:
        d2 = sqdist(centers, pts)                                # [K, N]
    in_radius = (d2 <= radius * radius) & pts_mask[None, :]
    off = jax.random.randint(key, (k, 1), 0, n)
    pos = jax.lax.broadcasted_iota(jnp.int32, (k, n), 1)
    shifted = pos - off                      # cyclic order from ``off``;
    shifted = jnp.where(shifted < 0, shifted + n, shifted)  # no int mod (slow)
    prio = -shifted.astype(jnp.float32)                          # in (-n, 0]
    scores = jnp.where(in_radius, prio, -jnp.inf)
    vals, idx = _random_topk(scores, nsample, use_approx)
    valid = vals > -jnp.inf
    idx = jnp.where(valid, idx, 0)
    return idx, valid


@functools.partial(
    jax.jit, static_argnames=("nsample", "block", "cand_blocks")
)
def ball_query_blocks(
    pts: jnp.ndarray,
    pts_mask: jnp.ndarray,
    centers: jnp.ndarray,
    radius: jnp.ndarray,
    key: jax.Array,
    nsample: int,
    d2: jnp.ndarray,
    block: int = 8,
    cand_blocks: int = 256,
):
    """Two-level ball query returning patch COORDS (gather-lean).

    Same contract as :func:`ball_query` + an immediate coordinate gather,
    but restructured for the TPU's gather lowering, whose cost is dominated
    by the number of gathered rows (measured ~11-17 ns/row regardless of
    row width: a [K, nsample] row gather from [N, 3] costs ~65 ms/pair at
    production shapes — the single largest stage in the pipeline).

    1. The cloud is viewed as ``N/block`` packed blocks of ``block``
       consecutive points (points arrive pre-shuffled, so a block is a
       uniform random sample). Per center, blocks are ranked by their
       IN-RADIUS MEMBER COUNT (fractional random tie-break) and the top
       ``cand_blocks`` become the candidate pool — one [K, cand_blocks]
       row gather of packed [block*3+block]-lane rows, ``nsample/2``x
       fewer rows than the point-level gather.
    2. Candidate points are re-tested against the radius directly (the
       packed rows carry coords + validity) and ``nsample`` of the
       in-radius candidates are selected by fresh random cyclic priorities
       (exact top-k at candidate width — narrow enough that exactness
       costs nothing vs ``approx_max_k`` at cloud width).

    Distribution: block membership is independent of geometry (shuffle
    blocks), so count-ranked block selection perturbs per-POINT inclusion
    probabilities only through a geometry-free random variable — the
    selected subset stays spatially uniform over the in-radius set.
    Capture: centers with <= cand_blocks occupied blocks keep ALL their
    in-radius points as candidates (sparse patches lose nothing, unlike
    ``approx_max_k`` at recall 0.5); dense centers get >= cand_blocks
    candidates. Returns (patches [K, nsample, 3], valid [K, nsample]);
    invalid slots carry the center's own coordinates (the zero-offset
    convention of ``select_patches``).
    """
    kq = centers.shape[0]
    n = pts.shape[0]
    nb = n // block
    r2 = radius * radius

    # ---- level 1: block ranking by in-radius member count ---------------
    # Level 1 tests the matmul-expansion d2 while level 2 re-tests the
    # direct squared distance; the two differ by ~1e-6 relative rounding.
    # Widen the level-1 test by that margin so a borderline point can never
    # hide its block from the candidate set — over-inclusion here only adds
    # candidates, level 2 still decides membership exactly.
    r2_l1 = r2 * (1.0 + 1e-5) + 1e-12
    d2b = d2[:, : nb * block].reshape(kq, nb, block)
    hits = (d2b <= r2_l1).astype(jnp.float32)         # masked d2 is BIG
    cnt = jnp.sum(hits, axis=-1)                      # [K, NB]
    k1, k2 = jax.random.split(key)
    off = jax.random.randint(k1, (kq, 1), 0, nb)
    pos = jax.lax.broadcasted_iota(jnp.int32, (kq, nb), 1)
    shifted = pos - off
    shifted = jnp.where(shifted < 0, shifted + nb, shifted)
    frac = 1.0 - shifted.astype(jnp.float32) / jnp.float32(nb)  # (0, 1]
    bscore = jnp.where(cnt > 0.0, cnt + frac, -jnp.inf)
    _, bidx = jax.lax.top_k(bscore, cand_blocks)      # [K, CB]

    # ---- the one gather: packed coord+valid block rows -------------------
    packed = jnp.concatenate(
        [
            pts[: nb * block].reshape(nb, block * 3),
            pts_mask[: nb * block].reshape(nb, block).astype(pts.dtype),
        ],
        axis=1,
    )                                                  # [NB, 4*block]
    rows = packed[bidx]                                # [K, CB, 4*block]
    cand = rows[..., : block * 3].reshape(kq, cand_blocks * block, 3)
    cmask = rows[..., block * 3 :].reshape(kq, cand_blocks * block) > 0.5

    # ---- level 2: exact random selection among candidates ---------------
    cd2 = jnp.sum(
        (cand - centers[:, None, :]) ** 2, axis=-1
    )                                                  # [K, CB*block]
    in_r = (cd2 <= r2) & cmask
    nc = cand_blocks * block
    off2 = jax.random.randint(k2, (kq, 1), 0, nc)
    pos2 = jax.lax.broadcasted_iota(jnp.int32, (kq, nc), 1)
    sh2 = pos2 - off2
    sh2 = jnp.where(sh2 < 0, sh2 + nc, sh2)
    prio2 = -sh2.astype(jnp.float32)
    scores2 = jnp.where(in_r, prio2, -jnp.inf)
    vals, sel = _random_topk(scores2, nsample, use_approx=False)
    valid = vals > -jnp.inf
    sel = jnp.where(valid, sel, 0)
    patches = jnp.take_along_axis(cand, sel[..., None], axis=1)
    patches = jnp.where(valid[..., None], patches, centers[:, None, :])
    return patches, valid


@functools.partial(jax.jit, static_argnames=("nsample",))
def ball_query_stratified(
    pts: jnp.ndarray,
    pts_mask: jnp.ndarray,
    centers: jnp.ndarray,
    radius: jnp.ndarray,
    key: jax.Array,
    nsample: int,
    d2: jnp.ndarray,
):
    """Gather-free stratified ball query returning patch COORDS.

    The round-4 fused-context profile (CUMULATIVE_r4.jsonl) showed patch
    selection dominating the per-scale cost (~19 ms/pair/scale at B=8):
    both the flat and the block paths end in a [K, nsample]-row gather
    (~1.5M rows at production shapes, and TPU gathers cost ~11-17 ns/row
    regardless of row width). This kernel removes BOTH the top-k and the
    gather:

    1. The (pre-shuffled) cloud is viewed as ``nsample`` STRIDED strips —
       strip ``s`` holds points ``{p : p % nsample == s}`` (layout
       [L, S]: S=nsample on the 128-lane axis, L=N/nsample on sublanes —
       a pure reshape of the [K, N] distance matrix, no relayout).
    2. Each strip contributes its first in-radius member in cyclic order
       from a per-(center, strip) random offset: a masked min-reduce over
       L (sublanes), no sort.
    3. Coordinates materialize through a fused one-hot reduction
       ``patch[k,s,:] = sum_l onehot[k,l,s] * pts[l,s,:]`` — elementwise
       multiply + reduce that XLA fuses with the selection, replacing the
       row gather entirely.

    Distribution: strips are uniform random subsets (the cloud arrives
    shuffled), so one-per-strip selection is STRATIFIED uniform sampling
    of the in-radius set — for dense balls this has strictly lower
    variance than the reference's take-first-nsample (same marginal
    inclusion probability, negative cross-slot correlation). Sparse balls
    (m in-radius points) capture every point that lands in a distinct
    strip: expected m - m^2/(2*nsample) of them; slots whose strip has no
    in-radius member are invalid (center-coord convention), matching the
    capture profile of ``approx_max_k`` at its shipped recall target.

    Requires ``pts.shape[0] % nsample == 0`` (capacity 30208 = 512 * 59)
    and the precomputed ``d2`` — callers fall back to :func:`ball_query`
    otherwise. Returns (patches [K, nsample, 3], valid [K, nsample]).
    """
    kq = centers.shape[0]
    n = pts.shape[0]
    s = nsample
    l = n // s
    r2 = radius * radius

    d2s = d2.reshape(kq, l, s)                      # strip = lane index
    mask_s = pts_mask.reshape(l, s)
    in_r = (d2s <= r2) & mask_s[None]               # [K, L, S]

    # per-(center, strip) cyclic rank: first in-radius point at or after a
    # random start wins. Ranks are unique within a strip, so the winner's
    # one-hot is exact (no ties).
    off = jax.random.randint(key, (kq, 1, s), 0, l)
    pos = jax.lax.broadcasted_iota(jnp.int32, (kq, l, s), 1)
    rank = pos - off
    rank = jnp.where(rank < 0, rank + l, rank)      # [K, L, S] in [0, L)
    score = jnp.where(in_r, rank, l)                # L == "no member"
    best = jnp.min(score, axis=1, keepdims=True)    # [K, 1, S]
    valid = best[:, 0, :] < l                       # [K, S]
    onehot = (score == best) & in_r                 # [K, L, S], one per strip

    pts_s = pts.reshape(l, s, 3)
    # fused select, one 3D reduction per coordinate: the [K,L,S,3]
    # broadcast-product form materialized a 4D intermediate (0.5 GB/cloud
    # at production shapes) that XLA did not reliably fuse into the
    # reduction (MICRO_r4.jsonl: ~7 ms/cloud-scale); three [K,L,S]
    # multiply-reduces fuse cleanly. f32 exactness matters (coordinates
    # at mm scale feed the LRF covariance).
    oh = onehot.astype(pts.dtype)                   # [K, L, S]
    patches = jnp.stack(
        [jnp.sum(oh * pts_s[None, :, :, c], axis=1) for c in range(3)],
        axis=-1,
    )                                               # [K, S, 3]
    patches = jnp.where(valid[..., None], patches, centers[:, None, :])
    return patches, valid
