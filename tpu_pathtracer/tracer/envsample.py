"""Environment-map importance sampling with multiple importance sampling.

The reference only finds the environment through BSDF sampling
(envLight on miss, src/renderkernel.cu:422-437,553-557), which is extremely
noisy for small bright sources (sun disks). BASELINE config #2 calls for
envmap importance sampling, so diffuse lanes additionally draw next-event
rays from the luminance-weighted lat-long distribution, combined with BSDF
sampling by the power heuristic. BSDF-found environment hits are
down-weighted by the complementary MIS weight so nothing is double counted.

Distribution build (host): p(row) ~ sum_col L(row,col) sin(theta_row);
p(col|row) ~ L(row,col). Sampling inverts the two CDFs with vectorized
searchsorted; pdf(dir) = p(u,v) * (W*H) / (2 pi^2 sin(theta)).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.vecmath import PI, TWO_PI, INV_PI


def build_env_distribution(env):
    """env: [H,W,3] float. Returns dict of numpy arrays for the sampler."""
    env = np.asarray(env, np.float32)
    H, W, _ = env.shape
    lum = (0.2126 * env[..., 0] + 0.7152 * env[..., 1]
           + 0.0722 * env[..., 2]).astype(np.float64)
    theta = (np.arange(H) + 0.5) / H * np.pi
    weighted = lum * np.sin(theta)[:, None] + 1e-12
    row_int = weighted.sum(axis=1)
    marg_cdf = np.cumsum(row_int)
    total = marg_cdf[-1]
    marg_cdf = marg_cdf / total
    cond_cdf = np.cumsum(weighted, axis=1)
    row_tot = cond_cdf[:, -1:]
    cond_cdf = cond_cdf / row_tot
    # pdf over the [0,1]^2 uv square
    pdf_uv = weighted * (H * W) / total
    return {
        "env_marg_cdf": marg_cdf.astype(np.float32),
        "env_cond_cdf": cond_cdf.astype(np.float32),
        "env_pdf_uv": pdf_uv.astype(np.float32),
    }


def _dir_from_uv(u, v, rotation):
    """Inverse of the envLight lat-long mapping (src/renderkernel.cu:425-430):
    u = (atan2(x, z)/2pi + rot) mod 1, v = acos(y)/pi."""
    phi = (u - rotation) * TWO_PI
    theta = v * PI
    sin_t = jnp.sin(theta)
    return jnp.stack([sin_t * jnp.sin(phi), jnp.cos(theta),
                      sin_t * jnp.cos(phi)], axis=-1)


def env_pdf_of_dir(scene, raydir, rotation):
    """Solid-angle pdf of the env sampler for given directions [N,3]."""
    pdf_uv = scene["env_pdf_uv"]
    H, W = pdf_uv.shape
    x, y, z = raydir[:, 0], raydir[:, 1], raydir[:, 2]
    longlat_x = jnp.arctan2(x, z)
    longlat_x = jnp.where(longlat_x < 0, longlat_x + TWO_PI, longlat_x)
    u = jnp.mod(longlat_x / TWO_PI + rotation, 1.0)
    v = jnp.arccos(jnp.clip(y, -1.0, 1.0)) / PI
    xi = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    p_uv = jnp.take(pdf_uv.reshape(-1), yi * W + xi)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - y * y, 1e-8))
    return p_uv / (2.0 * PI * PI * sin_t)


def sample_env_dir(scene, u1, u2, rotation):
    """Draw directions from the env distribution. Returns (dir [N,3],
    pdf [N])."""
    marg = scene["env_marg_cdf"]      # [H]
    cond = scene["env_cond_cdf"]      # [H,W]
    H = marg.shape[0]
    W = cond.shape[1]
    row = jnp.clip(jnp.searchsorted(marg, u1), 0, H - 1)
    # conditional inverse per lane: vectorized binary search over the row
    lo = jnp.zeros_like(row)
    size = jnp.full(row.shape, W, jnp.int32)
    cflat = cond.reshape(-1)
    for _ in range(12):  # 2^12 >= any reasonable W
        half = size >> 1
        mid = jnp.minimum(lo + half, W - 1)
        pred = jnp.take(cflat, row * W + mid) < u2
        lo = jnp.where(pred & (half > 0), mid + 1, lo)
        size = jnp.where(pred, size - half - 1, half)
    col = jnp.clip(lo, 0, W - 1)
    u = (col.astype(jnp.float32) + 0.5) / W
    v = (row.astype(jnp.float32) + 0.5) / H
    d = _dir_from_uv(u, v, rotation)
    pdf_uv = jnp.take(scene["env_pdf_uv"].reshape(-1), row * W + col)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - d[:, 1] ** 2, 1e-8))
    pdf = pdf_uv / (2.0 * PI * PI * sin_t)
    return d, pdf


def power_heuristic(pf, pg):
    pf2 = pf * pf
    return pf2 / jnp.maximum(pf2 + pg * pg, 1e-20)
