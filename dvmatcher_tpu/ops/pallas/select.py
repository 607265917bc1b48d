"""Shared in-kernel selection helpers for the Pallas TPU kernels.

`kth_smallest_threshold` is the K-th-order-statistic used by the fused kNN
attention (ops/pallas/knn_attention.py) and the fused Π-search kernels
(ops/pallas/pi_search.py): given a (T, N) distance block resident in VMEM it
returns the per-row threshold t with count(d <= t) >= K, using VPU
count-sweeps only (no sort, no gather — the reference's torch.topk gather
has no efficient TPU analogue).

Round-4 ablation on v5e (ckpt/bench_kernel_ablate_r4.log, B=16 N=4995
C=64): each count sweep costs ~0.2 ms and the original 24-round value
bisection was 34% of total fused-kernel time (15.70 ms full vs 10.39
nobisect). Round 5 adds a second method — Illinois-damped false position
on the (value, count) curve: distance CDFs are smooth, so the count at
each probe is an interpolation oracle — the probe lands near the K-th
quantile immediately instead of walking there one bit at a time. A
single TERMINAL snap sweep then replaces `hi` with the LARGEST DATA
VALUE <= hi (same count, strictly tighter), making the returned
threshold an actual distance value — the exact K-th smallest whenever
the bracket has isolated the bottom-K.

History of this design, with measurements: the first fp variant snapped
EVERY round (reusing the count sweep's compare mask), which is
convergence-neutral (CPU study across four regimes: selection sets
differ by <= 1 column vs plain Illinois at equal rounds) but NOT
cost-neutral — in-kernel the masked max is a second full VPU sweep,
0.53 ms/round vs bisection's 0.22 (ckpt/bench_kernel_r5.log: fp-16
with per-round snapping benched 18.9 ms total, a net REGRESSION vs
bisect-24's 15.7). Terminal-only snapping keeps the exactness and drops
the per-round cost back to bisection's.

Selection is tied to the kernels' `precision` flag through
`kth_smallest_for_precision`: "exact" keeps 24-round bisection (exact up
to ties; all kernel-vs-XLA-topk parity tests run this path), "fast" uses
18 plain fp rounds + 1 snap sweep (~79% of bisect-24's sweep cost; round
provenance in `kth_smallest_for_precision`). fp-12 was tried and
rejected: its over-selected near-ties join the attention softmax with
arbitrary energies and shifted fast-path outputs by up to 25% relative
at affected rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kth_smallest_threshold(
    d: jax.Array,  # (T, N) distances, +BIG at padded columns
    k: int,
    valid_row: jax.Array,  # (1, N) f32 0/1 column validity
    rounds: int = 24,
    method: str = "bisect",
) -> jax.Array:
    """Per-row K-th-smallest threshold (T, 1).

    Invariant (both methods, every round): count(d <= hi) >= K and
    count(d <= lo) < K is maintained by construction, and `hi` is returned
    — so the caller always selects AT LEAST K columns; the only
    approximation mode is selecting a few extra near-ties, which is
    immaterial under the softmax weighting downstream (reference
    torch.topk already picks an arbitrary tie subset).

    method="bisect" (default): the round-3 pure value bisection; rounds=24
    drives hi-lo below f32 mantissa resolution of the distance range, i.e.
    exact selection up to ties. This is the `precision="exact"` path and
    the behavior every kernel-vs-XLA-topk parity test locks down.
    method="fp": Illinois false position + terminal value snapping —
    each round probes the count-interpolated K-th quantile estimate
    instead of the bracket midpoint (same per-round sweep cost as
    bisection: one count sweep), converging superlinearly on smooth CDFs;
    when the same bracket side survives twice, the stale side's count
    residual is halved (classic Illinois anti-stall), bounding the worst
    case at bisection-like. After the last round ONE extra sweep snaps
    `hi` down to the largest data value <= hi (same count, strictly
    tighter, an actual order statistic) — so whenever the bracket has
    isolated the bottom-K the returned threshold IS the exact K-th
    smallest. Round count for the `precision="fast"` path is chosen by
    the measured exact-selection floor — see
    `kth_smallest_for_precision`.
    """
    t = d.shape[0]
    hi = jnp.max(d * valid_row, axis=-1, keepdims=True)  # exclude BIG pads
    lo = jnp.zeros((t, 1), jnp.float32)
    kf = float(k)

    if method == "bisect":

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum((d <= mid).astype(jnp.float32), axis=-1, keepdims=True)
            ge = cnt >= kf
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid)
            return lo, hi

        _, thr = jax.lax.fori_loop(0, rounds, body, (lo, hi))
        return thr

    # False position: residuals f(x) = count(d <= x) - K at the bracket
    # ends. f(lo=0) uses count 0 (true count(0) >= 1 from self-distances;
    # the secant self-corrects after the first probe). The initial upper
    # residual is DAMPED to 2K instead of the true N-K: with the true value
    # the first probes sit at the K/N quantile of the VALUE range, which on
    # concentrated high-dimensional feature distances (CDF flat until
    # ~25-50% of the range, then a near-step — the production regime for
    # both attention and Pi-search selection) wastes ~log2(N/K) rounds
    # crawling upward while Illinois halves the giant residual. Damping is
    # convergence-only: the bracket invariant never depends on residual
    # values, and after the first probe on each side the residuals are real
    # counts. Tuned across four distance regimes (uniform-3d, concentrated
    # 64d/128d, clustered-with-ties): see the round-5 commit.
    flo = jnp.full((t, 1), -kf, jnp.float32)
    nvalid = jnp.sum(valid_row)
    fhi = jnp.minimum(2.0 * kf, nvalid - kf) + jnp.zeros((t, 1), jnp.float32)
    fhi = jnp.maximum(fhi, 1.0)
    side = jnp.zeros((t, 1), jnp.float32)  # +1: hi replaced last, -1: lo

    def body(_, carry):
        lo, hi, flo, fhi, side = carry
        span = hi - lo
        mid = hi - fhi * span / jnp.maximum(fhi - flo, 1.0)
        # keep the probe strictly interior so the bracket always shrinks
        mid = jnp.clip(mid, lo + 0.01 * span, hi - 0.01 * span)
        cnt = jnp.sum((d <= mid).astype(jnp.float32), axis=-1, keepdims=True)
        fm = cnt - kf
        ge = fm >= 0.0
        # Illinois damping: a side retained twice gets its residual halved,
        # pulling the next secant toward the stale end
        flo_new = jnp.where(ge, jnp.where(side > 0, 0.5 * flo, flo), fm)
        fhi_new = jnp.where(ge, fm, jnp.where(side < 0, 0.5 * fhi, fhi))
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid)
        side = jnp.where(ge, 1.0, -1.0)
        return lo, hi, flo_new, fhi_new, side

    _, hi, _, _, _ = jax.lax.fori_loop(0, rounds, body, (lo, hi, flo, fhi, side))
    # TERMINAL value snapping (one extra sweep, not one per round): the
    # largest data value <= hi has the SAME count as hi but is strictly
    # tighter and an actual order statistic — whenever the bracket has
    # isolated the bottom-K (count(hi) == K) this IS the exact K-th
    # smallest. Round-5 measurement (tools/bench_kernel_ablate): snapping
    # EVERY round doubled per-round sweep cost in-kernel ((18.9-10.4)/16 =
    # 0.53 ms/round vs bisection's 0.22) while a CPU convergence study
    # across four distance regimes showed per-round snapping changes the
    # final selection set by <= 1 column vs plain Illinois at equal
    # rounds — the snap buys exactness, not convergence, so pay for it
    # once. Distances are >= 0 and count(hi) >= K >= 1 by the bracket
    # invariant, so the 0-fill never wins the max.
    return jnp.max(jnp.where(d <= hi, d, 0.0), axis=-1, keepdims=True)


def kth_smallest_for_precision(
    d: jax.Array,
    k: int,
    valid_row: jax.Array,
    precision: str,
) -> jax.Array:
    """Selection dispatch tied to the kernels' `precision` flag.

    "exact": 24-round bisection — selection exact up to ties, matches the
    XLA topk reference paths bit-for-bit in the parity tests; use for
    tests/debug and anywhere gradients must match the gather path.
    "fast": 18-round Illinois false position + ONE terminal value snap.
    Round-count provenance: fp-16 with per-round snapping was the measured
    exact-selection floor across regimes (squared 3-d point distances,
    64-d squared feature distances at k=9, 128-d euclidean at k=40) —
    fp-12 was rejected because its over-selected columns join the
    attention softmax with arbitrary energies (NOT quality-neutral, see
    test_knn_attention_fast_precision_close). The round-5 in-kernel
    ablation then showed per-round snapping costs a second full VPU sweep
    (0.53 ms/round vs bisection's 0.22 at the bench shape — the committed
    fp-16 was net SLOWER than bisect-24) while contributing nothing to
    convergence (CPU study: selection sets differ by <= 1 column at equal
    rounds). Plain rounds cost the same as bisection rounds, so 18 plain
    + 1 snap sweep dominates fp-16-snapping on both axes: >= its
    convergence on every regime studied, at ~55% of its sweep cost and
    ~79% of bisect-24's.
    """
    if precision == "fast":
        # DVM_FAST_SELECT (read at trace time) A/Bs the fast-path variant
        # in the REAL kernels; the default is the measured winner.
        import os

        variant = os.environ.get("DVM_FAST_SELECT", "fp18")
        if variant == "bisect24":
            return kth_smallest_threshold(d, k, valid_row, rounds=24,
                                          method="bisect")
        if variant.startswith("bisect") and variant.endswith("snap"):
            r = int(variant[len("bisect"):-len("snap")])
            thr = kth_smallest_threshold(d, k, valid_row, rounds=r,
                                         method="bisect")
            return jnp.max(jnp.where(d <= thr, d, 0.0), axis=-1,
                           keepdims=True)
        r = int(variant[2:]) if variant.startswith("fp") else 18
        return kth_smallest_threshold(d, k, valid_row, rounds=r, method="fp")
    return kth_smallest_threshold(d, k, valid_row, rounds=24, method="bisect")


def sq_dist_block(
    a: jax.Array,  # (T, C)
    b: jax.Array,  # (N, C)
    precision: str,
) -> jax.Array:
    """Squared-distance block on the MXU, clamped at 0.

    precision="fast": compensated bf16 — each operand split into hi + lo
    bf16 parts, the three non-negligible cross products packed as ONE
    matmul of contraction depth 3C (the dropped lo*lo term is ~2^-34
    relative). 3 effective MXU passes vs HIGHEST's 6, at ~2^-17 relative
    error — far below typical neighbor-distance gaps.
    """
    aa = jnp.sum(a * a, axis=-1, keepdims=True)
    bb = jnp.sum(b * b, axis=-1, keepdims=True)
    if precision == "fast":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        inner = jnp.dot(
            jnp.concatenate([ah, ah, al], axis=-1),
            jnp.concatenate([bh, bl, bh], axis=-1).T,
            preferred_element_type=jnp.float32,
        )
    else:
        inner = jnp.dot(
            a, b.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    return jnp.maximum(aa - 2.0 * inner + bb.T, 0.0)
