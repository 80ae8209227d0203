"""Fused Pallas TPU kernel for the MLSumcheck round step.

One HBM pass per round (vs. several for the fused-by-XLA jnp engine): each
grid step streams four input stripes into VMEM, folds by the challenge,
evaluates the round polynomial at t = 0..d for every product, block-reduces,
and writes the folded halves back — fold + evaluate + reduce in one kernel
(SURVEY.md Stage 3 "one fused Pallas kernel per round").

Table representation: the bit-reversed table T of length M is carried as the
half-pair `(lo, hi) = (T[:M/2], T[M/2:])`, each `(NUM_DIGITS, U+1, M/2)
uint32`. This pair form is *closed* under the round:

    folded[k]     = lo[k] + r*(hi[k] - lo[k])             (fold, k < M/2)
    new_lo[k]     = folded[k]          = fold(lo[k],     hi[k])
    new_hi[k]     = folded[k + M/4]    = fold(lo[k+M/4], hi[k+M/4])
    round pair k  = (folded[k], folded[k + M/4]) = (new_lo[k], new_hi[k])

so the kernel reads stripes {lo@k, lo@k+M/4, hi@k, hi@k+M/4}, writes
(new_lo@k, new_hi@k), and feeds the pair straight into the evaluation ladder.
Digit axis stays leading (blocks are (16, U+1, BN)); lanes are table indices.

Per-block partial sums are emitted relaxed (< BN * 2^16 per digit) into a
tiny (nblk, d+1, 16) output and finished exactly outside the kernel — the
in-XLA equivalent of the reference's rayon tree reduction
(`prover.rs:138-148`).

Product structure (indices, degree) is static per kernel; coefficients and
the challenge are runtime operands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import limbs_jnp as LJ
from ..fields.fr import NUM_DIGITS


def _kernel(fn):
    """Mark a Pallas kernel body so limb ops trace Mosaic-lowerable forms
    (`limbs_jnp.kernel_trace`: no dynamic digit indexing, fori unroll in
    {1, full}). Kernel functions run exactly once, at kernel-trace time."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with LJ.kernel_trace():
            return fn(*args, **kwargs)

    return wrapped


def _block_sums(E, O, coeff_blks, products, degree):
    """Round-poly partial sums for one block pair.

    E, O: lists of U (16, BN) strict digit blocks (start / start+step per
    table slot — the slot axis is a Python list, NOT an array axis: a packed
    (16, U, BN) array would tile U onto sublanes and pad it to 8, wasting
    HBM and ALU on ghost slots).
    coeff_blks: list of (16, BN) per-product Montgomery coefficient blocks
    (lane-replicated — Mosaic wants operands at full block width), or None
    when the coefficients were folded into the tables at init.
    Returns (degree+1, 16) uint32, digits relaxed (< BN * 2^16).
    """
    steps = [LJ.sub(o, e) for e, o in zip(E, O)]
    cur = list(E)
    rows = []
    for t in range(degree + 1):
        if t > 0:
            cur = [LJ.add(c, s) for c, s in zip(cur, steps)]
        tot = None
        for pi, ix in enumerate(products):
            term = cur[ix[0]]
            if coeff_blks is not None:
                term = LJ.mont_mul(coeff_blks[pi], term)
            for jx in ix[1:]:
                term = LJ.mont_mul(term, cur[jx])
            tot = term if tot is None else LJ.add(tot, term)
        # Mosaic lacks unsigned reductions; int32 is exact (< BN * 2^16 < 2^31)
        rows.append(jnp.sum(tot.astype(jnp.int32), axis=-1).astype(jnp.uint32))
    return jnp.stack(rows)  # (d+1, 16)


@_kernel
def _kernel_fold(products, degree, has_coeffs, num_slots, r_ref, coeff_ref,
                 lo0_ref, lo1_ref, hi0_ref, hi1_ref, flo_ref, fhi_ref, part_ref):
    r_blk = r_ref[:]  # (16, BN) lane-replicated challenge
    new_lo, new_hi = [], []
    for u in range(num_slots):
        l0, l1 = lo0_ref[u], lo1_ref[u]
        h0, h1 = hi0_ref[u], hi1_ref[u]
        nl = LJ.add(l0, LJ.mont_mul(LJ.sub(h0, l0), r_blk))
        nh = LJ.add(l1, LJ.mont_mul(LJ.sub(h1, l1), r_blk))
        flo_ref[u] = nl
        fhi_ref[u] = nh
        new_lo.append(nl)
        new_hi.append(nh)
    blks = [coeff_ref[pi] for pi in range(len(products))] if has_coeffs else None
    part_ref[0] = _block_sums(new_lo, new_hi, blks, products, degree)


@_kernel
def _kernel_nofold(products, degree, has_coeffs, num_slots, r_ref, coeff_ref,
                   lo_ref, hi_ref, part_ref):
    blks = [coeff_ref[pi] for pi in range(len(products))] if has_coeffs else None
    E = [lo_ref[u] for u in range(num_slots)]
    O = [hi_ref[u] for u in range(num_slots)]
    part_ref[0] = _block_sums(E, O, blks, products, degree)


@functools.lru_cache(maxsize=None)
def _build(half: int, num_slots: int, products: tuple, degree: int, do_fold: bool,
           block: int, interpret: bool, has_coeffs: bool):
    """Compile the fused round for one shape. `half` = current M/2 (the lo/hi
    length). Returns fn(lo, hi, r_blk, coeff_blk) -> ((new_lo, new_hi) | None,
    partials (nblk, d+1, 16))."""
    import jax.experimental.pallas as pl

    U1 = num_slots
    d1 = degree + 1
    P = len(products) if has_coeffs else 1
    if do_fold:
        quarter = half // 2
        nblk = quarter // block
        assert nblk >= 1 and quarter % block == 0
        tbl = lambda off: pl.BlockSpec(  # noqa: E731
            (U1, NUM_DIGITS, block), lambda j, off=off: (0, 0, j + off)
        )
        kernel = functools.partial(_kernel_fold, products, degree, has_coeffs, U1)
        fn = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((NUM_DIGITS, block), lambda j: (0, 0)),  # r
                pl.BlockSpec((P, NUM_DIGITS, block), lambda j: (0, 0, 0)),
                tbl(0),      # lo @ k
                tbl(nblk),   # lo @ k + M/4
                tbl(0),      # hi @ k
                tbl(nblk),   # hi @ k + M/4
            ],
            out_specs=[
                pl.BlockSpec((U1, NUM_DIGITS, block), lambda j: (0, 0, j)),
                pl.BlockSpec((U1, NUM_DIGITS, block), lambda j: (0, 0, j)),
                pl.BlockSpec((1, d1, NUM_DIGITS), lambda j: (j, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((U1, NUM_DIGITS, quarter), jnp.uint32),
                jax.ShapeDtypeStruct((U1, NUM_DIGITS, quarter), jnp.uint32),
                jax.ShapeDtypeStruct((nblk, d1, NUM_DIGITS), jnp.uint32),
            ],
            interpret=interpret,
        )

        def run(lo, hi, r_blk, coeff_blk):
            new_lo, new_hi, part = fn(r_blk, coeff_blk, lo, lo, hi, hi)
            return (new_lo, new_hi), _finish(part)

    else:
        nblk = half // block
        assert nblk >= 1 and half % block == 0
        kernel = functools.partial(_kernel_nofold, products, degree, has_coeffs, U1)
        fn = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((NUM_DIGITS, block), lambda j: (0, 0)),
                pl.BlockSpec((P, NUM_DIGITS, block), lambda j: (0, 0, 0)),
                pl.BlockSpec((U1, NUM_DIGITS, block), lambda j: (0, 0, j)),
                pl.BlockSpec((U1, NUM_DIGITS, block), lambda j: (0, 0, j)),
            ],
            out_specs=[pl.BlockSpec((1, d1, NUM_DIGITS), lambda j: (j, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((nblk, d1, NUM_DIGITS), jnp.uint32)],
            interpret=interpret,
        )

        def run(lo, hi, r_blk, coeff_blk):
            (part,) = fn(r_blk, coeff_blk, lo, hi)
            return None, _finish(part)

    def _finish(part):
        """(nblk, d+1, 16) relaxed partials -> (WIDE, d+1) exact strict sums."""
        # normalize each block's digits (value < BN * 2^16 * 2^16 fits 20)
        rows = jnp.moveaxis(part, -1, 0)  # (16, nblk, d+1)
        pad = [jnp.zeros_like(rows[0])] * (LJ.WIDE_DIGITS - NUM_DIGITS)
        strict, _ = LJ._chain([rows[i] for i in range(NUM_DIGITS)] + pad)
        return LJ.sum_lanes_wide(jnp.stack(strict), axis=1)  # (WIDE, d+1)

    return jax.jit(run)


@_kernel
def _kernel_chain_fold(products, degree, num_slots, r_ref, mask_ref,
                       lo0_ref, lo1_ref, hi0_ref, hi1_ref,
                       flo_ref, fhi_ref, part_ref):
    """Masked fold+evaluate for one chain block tile (shape-generic chained
    prover): identical math to `_kernel_fold` but lanes where `mask == 0`
    fold to 0 (they are past the traced active extent A2 and dead for every
    later round), so their products vanish from the block sums."""
    r_blk = r_ref[:]
    mask = mask_ref[:]  # (16, bt) uint32 0/1
    new_lo, new_hi = [], []
    for u in range(num_slots):
        l0, l1 = lo0_ref[u], lo1_ref[u]
        h0, h1 = hi0_ref[u], hi1_ref[u]
        nl = LJ.add(l0, LJ.mont_mul(LJ.sub(h0, l0), r_blk)) * mask
        nh = LJ.add(l1, LJ.mont_mul(LJ.sub(h1, l1), r_blk)) * mask
        flo_ref[u] = nl
        fhi_ref[u] = nh
        new_lo.append(nl)
        new_hi.append(nh)
    part_ref[0] = _block_sums(new_lo, new_hi, None, products, degree)


@_kernel
def _kernel_chain_fold_mxu(products, degree, num_slots, band_ref, mu_ref,
                           p_ref, mask_ref,
                           lo0_ref, lo1_ref, hi0_ref, hi1_ref,
                           flo_ref, fhi_ref, part_ref):
    """`_kernel_chain_fold` with the fold multiply on the MXU: the shared
    challenge arrives as its prebuilt (63, 32) bf16 convolution band
    (`ops/mxu_mul.scalar_band`), the constant mu/p reduction bands ride along
    as operands (Pallas kernels may not capture array constants), and each
    slot's fold is three in-kernel banded dots + carry normalization — same
    single-HBM-pass structure, the VPU keeps only carries and the evaluation
    ladder. Bit-identical."""
    from .mxu_mul import mont_mul_band

    band = band_ref[:]  # (63, 32) bf16
    mu_b = mu_ref[:]  # (32, 32) bf16
    p_b = p_ref[:]  # (63, 32) bf16
    mask = mask_ref[:]
    new_lo, new_hi = [], []
    for u in range(num_slots):
        l0, l1 = lo0_ref[u], lo1_ref[u]
        h0, h1 = hi0_ref[u], hi1_ref[u]
        nl = LJ.add(l0, mont_mul_band(LJ.sub(h0, l0), band, mu_b, p_b)) * mask
        nh = LJ.add(l1, mont_mul_band(LJ.sub(h1, l1), band, mu_b, p_b)) * mask
        flo_ref[u] = nl
        fhi_ref[u] = nh
        new_lo.append(nl)
        new_hi.append(nh)
    part_ref[0] = _block_sums(new_lo, new_hi, None, products, degree)


@_kernel
def _kernel_chain_nofold(products, degree, num_slots, mask_ref,
                         lo_ref, hi_ref, part_ref):
    mask = mask_ref[:]
    E = [lo_ref[u] * mask for u in range(num_slots)]
    O = [hi_ref[u] * mask for u in range(num_slots)]
    part_ref[0] = _block_sums(E, O, None, products, degree)


@functools.lru_cache(maxsize=None)
def _build_chain(B: int, num_slots: int, products: tuple, degree: int,
                 do_fold: bool, bt: int, interpret: bool, mxu: bool = False):
    """Fused masked block step for the shape-generic chain: processes one
    (U, 16, B) block as a grid of B/bt tiles. Returns
    fn(r_blk, mask, *stripes) -> pallas outputs (coefficients are always
    pre-folded into the tables on this path). With `mxu`, the fold variant
    takes the challenge's (63, 32) bf16 band instead of the lane-replicated
    digit block, and its multiplies run on the in-kernel MXU."""
    import jax.experimental.pallas as pl

    U1 = num_slots
    d1 = degree + 1
    nblk = B // bt
    assert nblk >= 1 and B % bt == 0
    tbl = pl.BlockSpec((U1, NUM_DIGITS, bt), lambda j: (0, 0, j))
    r_spec = pl.BlockSpec((NUM_DIGITS, bt), lambda j: (0, 0))  # (16, bt) operand
    mask_spec = pl.BlockSpec((NUM_DIGITS, bt), lambda j: (0, j))  # (16, B) operand
    part_spec = pl.BlockSpec((1, d1, NUM_DIGITS), lambda j: (j, 0, 0))
    part_shape = jax.ShapeDtypeStruct((nblk, d1, NUM_DIGITS), jnp.uint32)
    if do_fold:
        fold_out_specs = [tbl, tbl, part_spec]
        fold_out_shape = [
            jax.ShapeDtypeStruct((U1, NUM_DIGITS, B), jnp.uint32),
            jax.ShapeDtypeStruct((U1, NUM_DIGITS, B), jnp.uint32),
            part_shape,
        ]
        if mxu:
            from .mxu_mul import _MU_BAND, _P_BAND

            kernel = functools.partial(_kernel_chain_fold_mxu, products, degree, U1)
            band_spec = lambda rows: pl.BlockSpec(  # noqa: E731
                (rows, 32), lambda j: (0, 0)
            )
            call = pl.pallas_call(
                kernel,
                grid=(nblk,),
                in_specs=[band_spec(63), band_spec(32), band_spec(63),
                          mask_spec, tbl, tbl, tbl, tbl],
                out_specs=fold_out_specs,
                out_shape=fold_out_shape,
                interpret=interpret,
            )
            mu_b = jnp.asarray(_MU_BAND)
            p_b = jnp.asarray(_P_BAND)

            def run(r_band, mask, *stripes):
                return call(r_band, mu_b, p_b, mask, *stripes)

            return run
        kernel = functools.partial(_kernel_chain_fold, products, degree, U1)
        return pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=[r_spec, mask_spec, tbl, tbl, tbl, tbl],
            out_specs=fold_out_specs,
            out_shape=fold_out_shape,
            interpret=interpret,
        )
    kernel = functools.partial(_kernel_chain_nofold, products, degree, U1)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[mask_spec, tbl, tbl],
        out_specs=[part_spec],
        out_shape=[part_shape],
        interpret=interpret,
    )


def chain_block_sums_to_wide(part):
    """(nblk, d+1, 16) relaxed tile partials -> (WIDE, d+1) u32 with digits
    < 2^17: exact tile-sum (each digit < bt*2^16 <= 2^29, nblk <= 64 keeps
    the u32 sum exact), then one carry-free 16-bit split. Cheap enough to
    run per block; the chain accumulates these and normalizes once per
    round (`LJ._chain` in `_generic_step`)."""
    s = jnp.sum(part, axis=0)  # (d+1, 16)
    rows = jnp.moveaxis(s, -1, 0)  # (16, d+1)
    lo = rows & jnp.uint32(0xFFFF)
    hi = rows >> 16
    z = jnp.zeros((1, rows.shape[1]), jnp.uint32)
    pad = jnp.zeros((LJ.WIDE_DIGITS - NUM_DIGITS - 1, rows.shape[1]), jnp.uint32)
    return (
        jnp.concatenate([lo, z, pad], axis=0)
        + jnp.concatenate([z, hi, pad], axis=0)
    )


def round_pallas(lo, hi, r_digits, coeffs_pd, products: tuple, degree: int,
                 do_fold: bool, block: int = 1024, interpret: bool = False):
    """Run one fused round on the (lo, hi) table pair.

    lo, hi: (U, 16, half) uint32 — slot axis LEADING (untiled; a trailing or
    second-minor slot axis would be padded to 8 sublanes, costing 1.33x HBM
    and ALU for the 6-table reference workload); r_digits: (16,) challenge
    digits; coeffs_pd: (P, 16) per-product coefficient digits, or None when
    the coefficients are pre-folded into the tables. Operands are broadcast
    to full block width here (outside the kernel — Mosaic dislikes in-kernel
    sublane+lane double broadcasts). Returns ((new_lo, new_hi) | None, wide
    sums)."""
    half = lo.shape[2]
    block = min(block, (half // 2 if do_fold else half))
    r_blk = jnp.broadcast_to(r_digits[:, None], (NUM_DIGITS, block))
    has_coeffs = coeffs_pd is not None
    if has_coeffs:
        coeff_blk = jnp.broadcast_to(
            coeffs_pd[:, :, None], (len(products), NUM_DIGITS, block)
        )
    else:
        coeff_blk = jnp.zeros((1, NUM_DIGITS, block), jnp.uint32)  # unused
    fn = _build(half, lo.shape[0], products, degree, do_fold, block, interpret,
                has_coeffs)
    return fn(lo, hi, r_blk, coeff_blk)
