"""Pallas near-field bucket kernel — the FMM's sorted-slab hot path.

The FMM near field (physics/barneshut.py) resolves the (2R-1)^2 finest-cell
neighborhood particle-particle on a dense bucket grid [rows, res, K]. The
XLA stencil formulation materializes K x K broadcast temps through HBM per
neighbor offset (measured 366 ms of the 533 ms N=1M eval in round 1); this
kernel keeps the whole pair pipeline in VMEM.

Layout: buckets are flattened SLOT-MAJOR into [K, F] with row stride
S = res + 2*rr (columns pre-padded by the halo), so a neighbor-cell offset
(dr, dc) is the flat shift dr*S + dc — every slab a kernel tile needs is a
CONTIGUOUS slice of the flat axis (the "sorted-slab" idea: cell-sorted
storage makes neighborhoods contiguous). Each program:

  1. DMAs the (2rr+1) row-shifted slabs [K, C + 2rr] per field from HBM
     into VMEM scratch (pltpu.make_async_copy; all slabs in flight at
     once, then one wait);
  2. for each target slot i (lax.fori_loop) and each of the (2rr+1)^2
     static offsets, computes the [K, C] source-slot pair block against
     the [1, C] target row and reduces over source slots — pure VPU f32,
     ~13 ops/pair, no HBM traffic;
  3. writes the [K, C] per-slot accelerations through the blocked output.

Empty slots carry zero mass and vanish without masks; the self pair
(offset 0, i == j) has dx = dy = 0 so it contributes nothing (eps > 0).
Gated bit-for-bit-ish against the XLA stencil in tests/test_barneshut.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# Lane-aligned lead margin of each DMA'd slab: the column-shift halo rides
# inside this margin so HBM slice starts stay multiples of 128.
_LEAD = 128


def _nearfield_kernel(
    bx_hbm, by_hbm, bm_hbm,      # [K, F/128, 128] in ANY (HBM)
    outx_ref, outy_ref,          # [K, C] blocked output (VMEM, revisited)
    sx, sy, sm,                  # window scratch [K, WB, 128] each (VMEM)
    st,                          # target slab scratch [2, K, WB, 128]
    sems,                        # DMA semaphores [5]
    *,
    cap: int,
    rr: int,
    stride: int,
    tile: int,
    t0: int,
    eps_sq: float,
):
    # Grid = (flat tiles, 2rr+1 row shifts). The row-shift loop lives in
    # the grid — unrolling all (2rr+1)^2 offsets in one program OOMed the
    # compile helper — so each program DMAs ONE row-shifted slab and
    # unrolls only the 2rr+1 column shifts, accumulating into the
    # revisited output tile.
    i = pl.program_id(0)
    j = pl.program_id(1)                 # row shift dr = j - rr
    # The flat axis arrives as [K, F/128, 128]: DMA windows slice the
    # untiled middle axis at whole-lane-block indices (dynamically slicing
    # the tiled lane axis of an HBM memref crashes the Mosaic compiler).
    # Every window start is a sum of 128-multiples (t0, tile, stride, and
    # the lead margin are aligned by the wrapper); the +-rr column shifts
    # happen on the VMEM scratch as static sub-lane slices instead.
    base = t0 + i * tile - _LEAD
    w_blocks = (tile + 2 * _LEAD) // 128

    dmas = []
    start = (base + (j - rr) * stride) // 128
    for f, (hbm, scr) in enumerate(
            ((bx_hbm, sx), (by_hbm, sy), (bm_hbm, sm))):
        dma = pltpu.make_async_copy(
            hbm.at[:, pl.ds(start, w_blocks), :], scr.at[0], sems.at[f])
        dma.start()
        dmas.append(dma)

    # Target slab: fetched once per tile (at the first row shift) into
    # persistent scratch; scratch survives across grid steps.
    @pl.when(j == 0)
    def _fetch_targets():
        for f, hbm in enumerate((bx_hbm, by_hbm)):
            dma = pltpu.make_async_copy(
                hbm.at[:, pl.ds(base // 128, w_blocks), :],
                st.at[f],
                sems.at[3 + f])
            dma.start()
            dma.wait()

    for dma in dmas:
        dma.wait()

    def win(scr):
        return scr[0].reshape(cap, w_blocks * 128)

    # Per column shift, a full [K_tgt, K_src, C] pair block reduced over
    # source slots — static slices and 3D broadcasts (a per-slot loop with
    # dynamic sublane slicing lowered to vector rotates and ran slower
    # than the XLA stencil).
    tx = st[0].reshape(cap, w_blocks * 128)[:, _LEAD:_LEAD + tile]  # [K, C]
    ty = st[1].reshape(cap, w_blocks * 128)[:, _LEAD:_LEAD + tile]
    txb = tx[:, None, :]                               # [K, 1, C]
    tyb = ty[:, None, :]
    accx = jnp.zeros((cap, tile), jnp.float32)
    accy = jnp.zeros((cap, tile), jnp.float32)
    sxw = win(sx)
    syw = win(sy)
    smw = win(sm)
    for dc in range(-rr, rr + 1):
        sxs = sxw[:, _LEAD + dc:_LEAD + dc + tile][None, :, :]
        sys_ = syw[:, _LEAD + dc:_LEAD + dc + tile][None, :, :]
        sms = smw[:, _LEAD + dc:_LEAD + dc + tile][None, :, :]
        dx = sxs - txb                                 # [K, K, C]
        dy = sys_ - tyb
        d_sq = dx * dx + dy * dy
        inv = lax.rsqrt(d_sq + eps_sq)
        wgt = sms * (inv * inv * inv)
        if eps_sq == 0.0:
            wgt = jnp.where(d_sq > 0.0, wgt, 0.0)
        accx = accx + jnp.sum(wgt * dx, axis=1)
        accy = accy + jnp.sum(wgt * dy, axis=1)

    @pl.when(j == 0)
    def _init():
        outx_ref[:] = jnp.zeros_like(outx_ref)
        outy_ref[:] = jnp.zeros_like(outy_ref)

    outx_ref[:] += accx
    outy_ref[:] += accy


class _FlatLayout:
    """Constants of the slot-major flat bucket layout.

    Element (row_w, col) of the [rows_w, res, K] bucket grid lives at flat
    position lead + row_w*stride + col + rr (lead = _LEAD hosts the
    leftmost column shift and keeps DMA starts 128-aligned; stride is the
    padded row pitch). The force path scatters particles STRAIGHT into
    this layout (barneshut._near_field_buckets) — a tiny-minor-dim
    intermediate grid costs 10-40x in TPU tiling blowup.
    """

    def __init__(self, center_rows: int, res: int, cap: int, rr: int,
                 tile: int):
        self.center_rows = center_rows
        self.res = res
        self.cap = cap
        self.rr = rr
        self.stride = _cdiv(res + 2 * rr, 128) * 128
        region = center_rows * self.stride
        self.c = max(128, min(tile, 1 << (max(region, 2) - 1).bit_length()))
        self.ntiles = _cdiv(region, self.c)
        self.region = region
        self.t0 = _LEAD + rr * self.stride
        rows_w = center_rows + 2 * rr
        f_len = max(_LEAD + rows_w * self.stride,
                    self.t0 + self.ntiles * self.c
                    + rr * self.stride + _LEAD) + _LEAD
        self.f_len = _cdiv(f_len, 128) * 128

    def flat_index(self, row_w, col):
        """Flat position of (window row, column) — traced-friendly."""
        return _LEAD + row_w * self.stride + col + self.rr

    def out_index(self, center_row, col):
        """Index into the kernel's [K, ntiles*c] output arrays."""
        return center_row * self.stride + col + self.rr


def bucket_stencil_pallas_flat(
    bx_f: jax.Array,   # [K, F] slot-major flat positions x
    by_f: jax.Array,
    bm_f: jax.Array,   # zero mass = empty slot
    layout: _FlatLayout,
    *,
    eps_sq: float,
    interpret: bool = False,
):
    """Run the near-field kernel on pre-flattened [K, F] bucket arrays;
    returns (accx, accy) as [K, ntiles*c] flat outputs (see
    _FlatLayout.out_index)."""
    cap, rr, stride = layout.cap, layout.rr, layout.stride
    c, ntiles, t0, f_len = layout.c, layout.ntiles, layout.t0, layout.f_len
    res, center_rows = layout.res, layout.center_rows
    nw = 2 * rr + 1
    f32 = jnp.float32

    def blocked(a):
        return a.reshape(cap, f_len // 128, 128)

    bx_f, by_f, bm_f = blocked(bx_f), blocked(by_f), blocked(bm_f)

    kernel = functools.partial(
        _nearfield_kernel, cap=cap, rr=rr, stride=stride, tile=c, t0=t0,
        eps_sq=float(eps_sq))

    pairs = center_rows * res * cap * cap * nw * nw
    wb = (c + 2 * _LEAD) // 128
    outx, outy = pl.pallas_call(
        kernel,
        grid=(ntiles, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((cap, c), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, c), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap, ntiles * c), f32),
            jax.ShapeDtypeStruct((cap, ntiles * c), f32),
        ],
        scratch_shapes=[
            # Leading unit dim: DMA destinations are .at[0] views — a
            # plain 3D scratch destination faulted the TPU worker.
            pltpu.VMEM((1, cap, wb, 128), f32),
            pltpu.VMEM((1, cap, wb, 128), f32),
            pltpu.VMEM((1, cap, wb, 128), f32),
            pltpu.VMEM((2, cap, wb, 128), f32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=13 * pairs,
            bytes_accessed=3 * cap * f_len * 4 * nw
            + 2 * cap * layout.region * 4,
            transcendentals=pairs,
        ),
        interpret=interpret,
    )(bx_f, by_f, bm_f)
    return outx, outy


# ---------------------------------------------------------------------
# 3D: the octree near field (barneshut3d._near_field_buckets3)
# ---------------------------------------------------------------------
#
# Same sorted-slab idea, one dimension up. The flat layout makes x the
# ROW axis (row pitch `stride`, shifted via the grid dimension exactly
# like 2D rows) and flattens (y, z) into the COLUMN axis with z pitch
# sz = res + 2rr and y padded by rr rows of sz — so all (2rr+1)^2
# (oy, oz) neighbor shifts become STATIC column shifts dc = oy*sz + oz
# riding inside the lead margin, and the kernel body is the 2D kernel
# with one more coordinate field and a longer static shift list.

def _nearfield3_kernel(
    bx_hbm, by_hbm, bz_hbm, bm_hbm,   # [K, F/128, 128] in ANY (HBM)
    outx_ref, outy_ref, outz_ref,     # [K, C] blocked output (revisited)
    sx, sy, sz_s, sm,                 # window scratch [1, K, WB, 128]
    st,                               # target slab scratch [3, K, WB, 128]
    sems,                             # DMA semaphores [7]
    *,
    cap: int,
    rr: int,
    stride: int,
    col_shifts: tuple,
    tile: int,
    t0: int,
    lead: int,
    eps_sq: float,
):
    i = pl.program_id(0)
    j = pl.program_id(1)                 # x shift ox = j - rr
    base = t0 + i * tile - lead
    w_blocks = (tile + 2 * lead) // 128

    dmas = []
    start = (base + (j - rr) * stride) // 128
    for f, (hbm, scr) in enumerate(
            ((bx_hbm, sx), (by_hbm, sy), (bz_hbm, sz_s), (bm_hbm, sm))):
        dma = pltpu.make_async_copy(
            hbm.at[:, pl.ds(start, w_blocks), :], scr.at[0], sems.at[f])
        dma.start()
        dmas.append(dma)

    @pl.when(j == 0)
    def _fetch_targets():
        for f, hbm in enumerate((bx_hbm, by_hbm, bz_hbm)):
            dma = pltpu.make_async_copy(
                hbm.at[:, pl.ds(base // 128, w_blocks), :],
                st.at[f],
                sems.at[4 + f])
            dma.start()
            dma.wait()

    for dma in dmas:
        dma.wait()

    def win(scr):
        return scr[0].reshape(cap, w_blocks * 128)

    tx = st[0].reshape(cap, w_blocks * 128)[:, lead:lead + tile]   # [K, C]
    ty = st[1].reshape(cap, w_blocks * 128)[:, lead:lead + tile]
    tz = st[2].reshape(cap, w_blocks * 128)[:, lead:lead + tile]
    txb = tx[:, None, :]
    tyb = ty[:, None, :]
    tzb = tz[:, None, :]
    accx = jnp.zeros((cap, tile), jnp.float32)
    accy = jnp.zeros((cap, tile), jnp.float32)
    accz = jnp.zeros((cap, tile), jnp.float32)
    sxw = win(sx)
    syw = win(sy)
    szw = win(sz_s)
    smw = win(sm)
    for dc in col_shifts:
        sxs = sxw[:, lead + dc:lead + dc + tile][None, :, :]
        sys_ = syw[:, lead + dc:lead + dc + tile][None, :, :]
        szs = szw[:, lead + dc:lead + dc + tile][None, :, :]
        sms = smw[:, lead + dc:lead + dc + tile][None, :, :]
        dx = sxs - txb                                 # [K, K, C]
        dy = sys_ - tyb
        dz = szs - tzb
        d_sq = dx * dx + dy * dy + dz * dz
        inv = lax.rsqrt(d_sq + eps_sq)
        wgt = sms * (inv * inv * inv)
        if eps_sq == 0.0:
            wgt = jnp.where(d_sq > 0.0, wgt, 0.0)
        accx = accx + jnp.sum(wgt * dx, axis=1)
        accy = accy + jnp.sum(wgt * dy, axis=1)
        accz = accz + jnp.sum(wgt * dz, axis=1)

    @pl.when(j == 0)
    def _init():
        outx_ref[:] = jnp.zeros_like(outx_ref)
        outy_ref[:] = jnp.zeros_like(outy_ref)
        outz_ref[:] = jnp.zeros_like(outz_ref)

    outx_ref[:] += accx
    outy_ref[:] += accy
    outz_ref[:] += accz


class _FlatLayout3:
    """Constants of the 3D slot-major flat bucket layout.

    Element (x_w, y, z) of the [rows_w, res, res, K] bucket window lives
    at flat position lead + x_w*stride + (y + rr)*sz + z + rr, where
    sz = res + 2rr is the z pitch (y/z halos are zero cells inside the
    slab) and stride is the 128-aligned x pitch. `lead` is sized to host
    the largest column shift rr*sz + rr and keep DMA starts aligned.
    """

    def __init__(self, center_rows: int, res: int, cap: int, rr: int,
                 tile: int):
        self.center_rows = center_rows
        self.res = res
        self.cap = cap
        self.rr = rr
        self.sz = res + 2 * rr
        slab = (res + 2 * rr) * self.sz
        self.stride = _cdiv(slab, 128) * 128
        self.lead = _cdiv(max(_LEAD, rr * self.sz + rr), 128) * 128
        region = center_rows * self.stride
        self.c = max(128, min(tile, 1 << (max(region, 2) - 1).bit_length()))
        self.ntiles = _cdiv(region, self.c)
        self.region = region
        self.t0 = self.lead + rr * self.stride
        rows_w = center_rows + 2 * rr
        f_len = max(self.lead + rows_w * self.stride,
                    self.t0 + self.ntiles * self.c
                    + rr * self.stride + self.lead) + self.lead
        self.f_len = _cdiv(f_len, 128) * 128
        self.col_shifts = tuple(
            oy * self.sz + oz
            for oy in range(-rr, rr + 1) for oz in range(-rr, rr + 1))

    def flat_index(self, x_w, y, z):
        """Flat position of (window x-slab, y, z) — traced-friendly."""
        return (self.lead + x_w * self.stride + (y + self.rr) * self.sz
                + z + self.rr)

    def out_index(self, x_c, y, z):
        """Index into the kernel's [K, ntiles*c] output arrays."""
        return x_c * self.stride + (y + self.rr) * self.sz + z + self.rr


def bucket_stencil3_pallas_flat(
    bx_f: jax.Array,   # [K, F] slot-major flat positions x
    by_f: jax.Array,
    bz_f: jax.Array,
    bm_f: jax.Array,   # zero mass = empty slot
    layout: _FlatLayout3,
    *,
    eps_sq: float,
    interpret: bool = False,
):
    """Run the 3D near-field kernel on pre-flattened [K, F] bucket arrays;
    returns (accx, accy, accz) as [K, ntiles*c] flat outputs (see
    _FlatLayout3.out_index)."""
    cap, rr, stride = layout.cap, layout.rr, layout.stride
    c, ntiles, t0, f_len = layout.c, layout.ntiles, layout.t0, layout.f_len
    lead = layout.lead
    nw = 2 * rr + 1
    f32 = jnp.float32

    def blocked(a):
        return a.reshape(cap, f_len // 128, 128)

    bx_f, by_f, bz_f, bm_f = (blocked(a) for a in (bx_f, by_f, bz_f, bm_f))

    kernel = functools.partial(
        _nearfield3_kernel, cap=cap, rr=rr, stride=stride,
        col_shifts=layout.col_shifts, tile=c, t0=t0, lead=lead,
        eps_sq=float(eps_sq))

    pairs = layout.region * cap * cap * nw * nw * nw
    wb = (c + 2 * lead) // 128
    outx, outy, outz = pl.pallas_call(
        kernel,
        grid=(ntiles, nw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[
            pl.BlockSpec((cap, c), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((cap, ntiles * c), f32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((1, cap, wb, 128), f32),
            pltpu.VMEM((1, cap, wb, 128), f32),
            pltpu.VMEM((1, cap, wb, 128), f32),
            pltpu.VMEM((1, cap, wb, 128), f32),
            pltpu.VMEM((3, cap, wb, 128), f32),
            pltpu.SemaphoreType.DMA((7,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * pairs,
            bytes_accessed=4 * cap * f_len * 4 * nw
            + 3 * cap * layout.region * 4,
            transcendentals=pairs,
        ),
        interpret=interpret,
    )(bx_f, by_f, bz_f, bm_f)
    return outx, outy, outz


@functools.partial(
    jax.jit,
    static_argnames=("rr", "eps_sq", "center_rows", "tile", "interpret"),
)
def bucket_stencil_pallas(
    bx: jax.Array,     # [center_rows + 2rr, res, K] bucket positions x
    by: jax.Array,
    bm: jax.Array,     # zero mass = empty slot
    *,
    rr: int,
    eps_sq: float,
    center_rows: int,
    tile: int = 1024,   # [K, K, tile] pair blocks: 1 MB temps in VMEM
    interpret: bool = False,
):
    """Drop-in Pallas replacement for barneshut._bucket_stencil: same
    [rows + 2rr halo, res, K] input layout, returns (accx, accy) as
    [center_rows, res, K] (unscaled by g_const). The force path avoids the
    grid round trip entirely via bucket_stencil_pallas_flat."""
    rows_w, res, cap = bx.shape
    f32 = jnp.float32
    layout = _FlatLayout(center_rows, res, cap, rr, tile)
    stride, f_len = layout.stride, layout.f_len

    def to_flat(a):
        a = jnp.pad(a.astype(f32),
                    ((0, 0), (rr, stride - res - rr), (0, 0)))
        a = a.reshape(rows_w * stride, cap).T          # [K, rows_w*stride]
        return jnp.pad(a, ((0, 0), (_LEAD, f_len - _LEAD - rows_w * stride)))

    outx, outy = bucket_stencil_pallas_flat(
        to_flat(bx), to_flat(by), to_flat(bm), layout,
        eps_sq=eps_sq, interpret=interpret)

    def from_flat(o):
        o = o[:, :layout.region].T.reshape(center_rows, stride, cap)
        return o[:, rr:rr + res, :]

    return from_flat(outx), from_flat(outy)
