"""Shared plane-level building blocks for the Pallas path-tracing kernels.

All kernels keep per-ray state as [8, 128] f32 "component planes" (the
native VPU tile). This module holds the pieces common to the sphere-soup
megakernel and the CSG tape kernel:

- PCG4D RNG over uint32 planes (bit-identical to render/sampling.py);
- RTIOW material scatter on planes (bit-identical to render/materials.py);
- thin-lens/pinhole camera ray generation from SMEM scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TILE_ROWS = 8
TILE_LANES = 128
TILE = TILE_ROWS * TILE_LANES

BIG = np.float32(1e30)
BIG_CUT = np.float32(5e29)

# Camera scalar layout in the f32 SMEM row
CAM_SIZE = 24
META_SIZE = 8


def pcg4d_planes(a, b, c, d):
    """PCG4D hash on uint32 planes -> four f32 uniforms in [0,1)."""
    mul = jnp.uint32(1664525)
    inc = jnp.uint32(1013904223)
    v = [x * mul + inc for x in (a, b, c, d)]
    v[0] = v[0] + v[1] * v[3]
    v[1] = v[1] + v[2] * v[0]
    v[2] = v[2] + v[0] * v[1]
    v[3] = v[3] + v[1] * v[2]
    v = [x ^ (x >> jnp.uint32(16)) for x in v]
    v[0] = v[0] + v[1] * v[3]
    v[1] = v[1] + v[2] * v[0]
    v[2] = v[2] + v[0] * v[1]
    v[3] = v[3] + v[1] * v[2]
    scale = jnp.float32(1.0 / 16777216.0)
    # Mosaic has no uint32->f32 cast; after >>8 the value fits 24 bits, so
    # the int32 round-trip is exact.
    return tuple(
        (x >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * scale
        for x in v
    )


def dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def scatter_planes(kind, param, alb, d, n, front, u0, u1, u2):
    """RTIOW material dispatch on planes (see render/materials.py).

    kind/param/alb_* are per-ray attribute planes; d the incoming direction
    planes; n the unit shading normal planes (already opposing d); front the
    solid-level front-face mask. Returns (new_d, atten, emitted, terminate).
    """
    dx, dy, dz = d
    nx, ny, nz = n
    ar, ag, ab = alb

    inv_len = jax.lax.rsqrt(
        jnp.maximum(dot3(dx, dy, dz, dx, dy, dz), jnp.float32(1e-20))
    )
    udx, udy, udz = dx * inv_len, dy * inv_len, dz * inv_len

    z = 1.0 - 2.0 * u0
    r_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = jnp.float32(2.0 * np.pi) * u1
    rux = r_ * jnp.cos(phi)
    ruy = r_ * jnp.sin(phi)
    ruz = z

    lamx, lamy, lamz = nx + rux, ny + ruy, nz + ruz
    lam_deg = dot3(lamx, lamy, lamz, lamx, lamy, lamz) < jnp.float32(1e-12)
    lamx = jnp.where(lam_deg, nx, lamx)
    lamy = jnp.where(lam_deg, ny, lamy)
    lamz = jnp.where(lam_deg, nz, lamz)

    ud_dot_n = dot3(udx, udy, udz, nx, ny, nz)
    rfx = udx - 2.0 * ud_dot_n * nx
    rfy = udy - 2.0 * ud_dot_n * ny
    rfz = udz - 2.0 * ud_dot_n * nz
    mex = rfx + param * rux
    mey = rfy + param * ruy
    mez = rfz + param * ruz
    metal_absorbed = dot3(mex, mey, mez, nx, ny, nz) <= 0.0

    ior = jnp.maximum(param, jnp.float32(1e-6))
    eta = jnp.where(front, 1.0 / ior, ior)
    cos_t = jnp.minimum(-ud_dot_n, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    cannot = eta * sin_t > 1.0
    r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
    rp = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
    use_refl = cannot | (u2 < rp)
    ppx = eta * (udx + cos_t * nx)
    ppy = eta * (udy + cos_t * ny)
    ppz = eta * (udz + cos_t * nz)
    pl2 = dot3(ppx, ppy, ppz, ppx, ppy, ppz)
    par = -jnp.sqrt(jnp.abs(1.0 - pl2))
    refx = ppx + par * nx
    refy = ppy + par * ny
    refz = ppz + par * nz
    dlx = jnp.where(use_refl, rfx, refx)
    dly = jnp.where(use_refl, rfy, refy)
    dlz = jnp.where(use_refl, rfz, refz)

    is_lam = kind == 1.0
    is_metal = kind == 2.0
    is_diel = kind == 3.0
    is_em = kind == 4.0
    is_nm = kind == 0.0

    ndx = jnp.where(is_lam, lamx, jnp.where(is_metal, mex, dlx))
    ndy = jnp.where(is_lam, lamy, jnp.where(is_metal, mey, dly))
    ndz = jnp.where(is_lam, lamz, jnp.where(is_metal, mez, dlz))
    atr = jnp.where(is_diel, 1.0, ar)
    atg = jnp.where(is_diel, 1.0, ag)
    atb = jnp.where(is_diel, 1.0, ab)
    emr = jnp.where(is_nm, 0.5 * (nx + 1.0), jnp.where(is_em, ar, 0.0))
    emg = jnp.where(is_nm, 0.5 * (ny + 1.0), jnp.where(is_em, ag, 0.0))
    emb = jnp.where(is_nm, 0.5 * (nz + 1.0), jnp.where(is_em, ab, 0.0))
    term = is_nm | is_em | (is_metal & metal_absorbed)
    return (
        (ndx, ndy, ndz),
        (atr, atg, atb),
        (emr, emg, emb),
        term,
        (udx, udy, udz),
    )


def sky_planes(ud, mode: str):
    """Background radiance planes from unit direction planes."""
    udx, udy, udz = ud
    if mode == "black":
        zero = jnp.zeros_like(udy)
        return zero, zero, zero
    if mode == "rtiow":
        t = 0.5 * (udy + 1.0)
    elif mode == "wololo":
        t = udy
    else:  # pragma: no cover
        raise ValueError(f"bad sky mode {mode}")
    return (
        (1.0 - t) + t * 0.5,
        (1.0 - t) + t * 0.7,
        (1.0 - t) + t * 1.0,
    )
