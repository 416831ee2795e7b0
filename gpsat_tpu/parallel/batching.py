"""Ragged expert tiles -> padded shape buckets.

The reference selects each expert's training data dynamically and fits one
model at a time (ref: GPSat/local_experts.py:930-1260). The TPU design
inverts this: all per-expert index sets are computed up front on host, then
experts are grouped into *shape buckets* (padded to a shared Nmax per
bucket) so each bucket is ONE jitted XLA program over a [B, Nmax, ...]
batch. Bucket sizes are rounded up to multiples of the TPU lane width (128)
to keep the MXU tiled; masked rows are neutralized by
gpsat_tpu.ops.linalg.mask_gram so results are bit-identical to the ragged
computation (tests/test_ops.py padding-invariance).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np

LANE = 128

# HBM-aware cap on experts per program. The exact-GPR fused value+grad
# graph keeps ~LIVE_FACTOR simultaneous [B, Nmax, Nmax] f32 buffers live
# (K, L, W, squared-distance grams and their adjoints); a dense bucket of
# many large tiles must split into several programs or the device OOMs.
# The reference never hits this (one expert at a time); here it's the
# price of batching. Override budget via GPSAT_HBM_BUDGET_GB (default 10
# of a v5e's 16 GB — headroom for predict buffers + L-BFGS state), or
# disable with GPSAT_AUTO_BATCH_CAP=0.
_LIVE_FACTOR = 8
_F32_BYTES = 4


def auto_batch_cap(nmax: int) -> Optional[int]:
    """Max experts per [B, nmax, nmax] program under the HBM budget
    (None = uncapped). At nmax=512 under the default 10 GB budget the cap
    is ~1192 (10e9 / (8 live buffers * 512^2 * 4 bytes)): default-shape
    benches (B <= 1024) never split, but very wide dense-GPR buckets do
    (the pan-Arctic pipeline's 1664-expert bucket splits in two — 8 live
    [1664, 512, 512] f32 buffers would be ~14 GB, over a v5e's 16 GB)."""
    import os

    if os.environ.get("GPSAT_AUTO_BATCH_CAP", "1") == "0":
        return None
    budget_gb = float(os.environ.get("GPSAT_HBM_BUDGET_GB", "10"))
    cap = int(budget_gb * 1e9 / (_LIVE_FACTOR * nmax * nmax * _F32_BYTES))
    return max(cap, 1)


def round_up(n: int, multiple: int = LANE) -> int:
    return int(-(-n // multiple) * multiple)


def bucket_size(n: int, multiple: int = LANE) -> int:
    """Pad target for a tile of n rows: next power-of-two multiple of 128
    (fewer distinct shapes => fewer XLA compilations)."""
    m = round_up(max(n, 1), multiple)
    # round up to power-of-two multiples of `multiple` to bound bucket count
    p = multiple
    while p < m:
        p *= 2
    return p


@dataclasses.dataclass
class TileBatch:
    """One shape bucket of padded expert tiles."""

    X: np.ndarray  # [B, Nmax, D]  scaled training coords
    y: np.ndarray  # [B, Nmax]     scaled, de-meaned obs
    mask: np.ndarray  # [B, Nmax]  1.0 valid / 0.0 padded
    Xnew: np.ndarray  # [B, Pmax, D] scaled prediction coords
    pred_mask: np.ndarray  # [B, Pmax]
    obs_mean: np.ndarray  # [B] per-tile subtracted mean (0 unless obs_mean='local')
    expert_index: np.ndarray  # [B] row index into the expert-locations table
    num_obs: np.ndarray  # [B] true (unpadded) obs count
    expert_loc: Optional[np.ndarray] = None  # [B, D] scaled expert locations

    @property
    def B(self) -> int:
        return self.X.shape[0]

    @property
    def Nmax(self) -> int:
        return self.X.shape[1]

    @property
    def Pmax(self) -> int:
        return self.Xnew.shape[1]


def assemble_tiles(
    coords: np.ndarray,
    obs: np.ndarray,
    tile_indices: Sequence[np.ndarray],
    pred_coords: Sequence[np.ndarray],
    expert_index: Optional[np.ndarray] = None,
    *,
    expert_locs: Optional[np.ndarray] = None,
    coords_scale=None,
    obs_mean: Optional[str] = None,
    max_batch_size: Optional[int] = None,
    memory_cap: bool = False,
    coalesce: Optional[bool] = None,
    dtype=np.float64,
) -> List[TileBatch]:
    """Build padded TileBatches from per-expert row-index sets.

    Parameters
    ----------
    coords: [Ntot, D] raw observation coordinates (unscaled).
    obs: [Ntot] raw observation values.
    tile_indices: per-expert integer row indices into coords/obs.
    pred_coords: per-expert [P_i, D] raw prediction coordinates.
    expert_index: per-expert identifier carried into results (default arange).
    coords_scale: optional [D] divisor applied to coords and pred coords
        (ref: base_model.py:243 ``coords /= coords_scale``).
    obs_mean: None (no de-meaning) or 'local' (subtract per-tile mean,
        ref: base_model.py:195-198).
    max_batch_size: optional cap on experts per batch (memory control).
    memory_cap: apply the HBM-aware auto_batch_cap per bucket. Set by the
        orchestrator for cores with [B, Nmax, Nmax]-sized live buffers
        (dense exact GPR); chunked/sparse cores (SGPR/SVGP at large N)
        must leave it off — their working set is O(B M (M+C)).
    expert_locs: optional [E, D] raw expert locations; scaled like coords
        and carried per tile (cores that need a reference point, e.g. the
        VFF domain center, read them from batch.expert_loc).
    coalesce: pad EVERY tile to one global (nmax, pmax) so the whole
        expert set compiles to a single program shape and dispatches in
        the fewest device round trips (HBM cap still splits oversized
        batches, but the splits share one compiled program). Trades extra
        padded FLOPs on small tiles for fewer dispatches — a win when the
        wall is link/relay latency, not device compute (the measured
        pan-Arctic regime, BENCH_PIPELINE_r05.json). Default from
        GPSAT_COALESCE_BUCKETS (off).
    """
    E = len(tile_indices)
    assert len(pred_coords) == E
    if expert_index is None:
        expert_index = np.arange(E)
    expert_index = np.asarray(expert_index)

    coords = np.asarray(coords, dtype=dtype)
    obs = np.asarray(obs, dtype=dtype).reshape(len(coords))
    if coords_scale is not None:
        coords = coords / np.asarray(coords_scale, dtype=dtype)
    if expert_locs is not None:
        expert_locs = np.asarray(expert_locs, dtype=dtype).reshape(E, coords.shape[1])
        if coords_scale is not None:
            expert_locs = expert_locs / np.asarray(coords_scale, dtype=dtype)

    sizes = np.array([len(ix) for ix in tile_indices])
    order = np.argsort(sizes, kind="stable")  # group similar sizes together

    if coalesce is None:
        coalesce = os.environ.get("GPSAT_COALESCE_BUCKETS", "0") == "1"
    forced_nmax = forced_pmax = None
    if coalesce and E:
        forced_nmax = bucket_size(int(sizes.max()))
        forced_pmax = bucket_size(int(max(max(len(pc), 1) for pc in pred_coords)), multiple=8)

    batches: List[TileBatch] = []
    current: List[int] = []
    current_bucket = None

    def flush(group: List[int]):
        if not group:
            return
        nmax = forced_nmax or bucket_size(int(max(sizes[g] for g in group)))
        # prediction axis shares the power-of-two bucket rule so buckets
        # reuse compiled programs (predict is cheap; compiles are not)
        pmax = forced_pmax or bucket_size(int(max(max(len(pred_coords[g]), 1) for g in group)), multiple=8)
        B = len(group)
        D = coords.shape[1]
        X = np.zeros((B, nmax, D), dtype=dtype)
        y = np.zeros((B, nmax), dtype=dtype)
        mask = np.zeros((B, nmax), dtype=dtype)
        Xnew = np.zeros((B, pmax, D), dtype=dtype)
        pmask = np.zeros((B, pmax), dtype=dtype)
        mean = np.zeros((B,), dtype=dtype)
        for b, g in enumerate(group):
            ix = np.asarray(tile_indices[g])
            n = len(ix)
            X[b, :n] = coords[ix]
            yy = obs[ix]
            if obs_mean == "local" and n > 0:
                mean[b] = yy.mean()
                yy = yy - mean[b]
            y[b, :n] = yy
            mask[b, :n] = 1.0
            pc = np.asarray(pred_coords[g], dtype=dtype).reshape(-1, D)
            if coords_scale is not None:
                pc = pc / np.asarray(coords_scale, dtype=dtype)
            p = len(pc)
            Xnew[b, :p] = pc
            pmask[b, :p] = 1.0
        batches.append(
            TileBatch(
                X=X,
                y=y,
                mask=mask,
                Xnew=Xnew,
                pred_mask=pmask,
                obs_mean=mean,
                expert_index=expert_index[np.asarray(group)],
                num_obs=sizes[np.asarray(group)].astype(np.int64),
                expert_loc=None if expert_locs is None else expert_locs[np.asarray(group)],
            )
        )

    if forced_nmax is not None:
        # one global shape: if the HBM cap forces k programs, split EVENLY
        # and pad every split to the same B so all k share one compiled
        # executable (remote compiles are minutes through the relay; a
        # ragged 1192+472 split would compile twice, 832+832 once)
        cap = auto_batch_cap(forced_nmax) if memory_cap else None
        if max_batch_size:
            cap = max_batch_size if cap is None else min(cap, max_batch_size)
        group = [int(g) for g in order]
        k = -(-len(group) // cap) if (cap and len(group) > cap) else 1
        B_prog = -(-len(group) // k)
        for i in range(k):
            flush(group[i * B_prog : (i + 1) * B_prog])
        if k > 1:
            batches[-1] = pad_batch_to(batches[-1], B_prog)
        return batches

    for gi in order:
        bkt = bucket_size(int(sizes[gi]))
        cap = auto_batch_cap(bkt) if memory_cap else None
        if max_batch_size:
            cap = max_batch_size if cap is None else min(cap, max_batch_size)
        if current and (bkt != current_bucket or (cap and len(current) >= cap)):
            flush(current)
            current = []
        current_bucket = bkt
        current.append(int(gi))
    flush(current)
    return batches


def take_batch(batch: TileBatch, idx: np.ndarray) -> TileBatch:
    """Row-subset of a batch (idx indexes the expert axis)."""
    idx = np.asarray(idx)
    rep = {}
    for f in dataclasses.fields(batch):
        v = getattr(batch, f.name)
        rep[f.name] = None if v is None else np.asarray(v)[idx]
    return TileBatch(**rep)


def cast_batch(batch: TileBatch, dtype) -> TileBatch:
    """Same tiles at a different float dtype (integer fields untouched)."""
    rep = {}
    for f in dataclasses.fields(batch):
        v = getattr(batch, f.name)
        if v is not None and np.issubdtype(np.asarray(v).dtype, np.floating):
            v = np.asarray(v).astype(dtype)
        rep[f.name] = v
    return TileBatch(**rep)


def pad_batch_to(batch: TileBatch, B_target: int) -> TileBatch:
    """Pad the expert axis with dead tiles (mask all-zero) so batches can
    share a compiled program / divide a device mesh evenly."""
    B = batch.B
    if B == B_target:
        return batch
    assert B_target > B
    pad = B_target - B

    def padB(a, fill=0.0):
        shape = (pad,) + a.shape[1:]
        return np.concatenate([a, np.full(shape, fill, dtype=a.dtype)], axis=0)

    return TileBatch(
        X=padB(batch.X),
        y=padB(batch.y),
        mask=padB(batch.mask),
        Xnew=padB(batch.Xnew),
        pred_mask=padB(batch.pred_mask),
        obs_mean=padB(batch.obs_mean),
        expert_index=padB(batch.expert_index, fill=-1),
        num_obs=padB(batch.num_obs, fill=0),
        expert_loc=None if batch.expert_loc is None else padB(batch.expert_loc),
    )
