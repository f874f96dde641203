"""BSDF samplers, vectorized and branch-free.

Re-implements the reference device material library (src/reflection.cuh) as
batched jnp functions over wavefront columns. Each sampler consumes explicit
uniform random columns (the reference's r1, r2, r3 arguments) and returns
(next_dir, throughput multiplier, flags) arrays. Where the reference carries
a documented quirk we either keep it (when it shapes the rendered look) or
fix it (noting the deviation):

* `fresnelBlend`'s min(0.01, |cos|) clamps (src/reflection.cuh:422-433) are
  KEPT — they define the MAT_FRESNEL appearance in the gallery.
* `minf3f`'s y/z component duplication bug (src/linear_math.h:156) is FIXED:
  we clamp beta with a true component-wise minimum.
* Rough glass / microfacet sampling reuse r1 for both the normal sample and
  the reflect/refract decision (src/reflection.cuh:305,368) — KEPT.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import (
    PI, TWO_PI, PI_OVER_2, dot, dotk, normalize, reflect, make_basis,
    cosine_sample_hemisphere,
)
from .fresnel import pow5, fresnel_schlick, fresnel_dielectric


def _ggx_sample_normal_iso(u1, u2, alpha2, n):
    """Sample a GGX microfacet normal about n (isotropic).
    cosTheta = 1/sqrt(1 + a^2 u/(1-u)) (src/reflection.cuh:217-220)."""
    cos_t = 1.0 / jnp.sqrt(1.0 + alpha2 * u1 / jnp.maximum(1.0 - u1, 1e-7))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = TWO_PI * u2
    t, b = make_basis(n)
    m = (sin_t * jnp.cos(phi))[..., None] * t \
        + (sin_t * jnp.sin(phi))[..., None] * b \
        + cos_t[..., None] * n
    return normalize(m)


def _ggx_sample_normal_aniso(u1, u2, alphax, alphay, n, tangent):
    """Anisotropic GGX normal sample (src/reflection.cuh:221-229)."""
    phi = jnp.arctan(alphay / jnp.maximum(alphax, 1e-7)
                     * jnp.tan(TWO_PI * u1 + PI_OVER_2))
    phi = jnp.where(u1 > 0.5, phi + PI, phi)
    sp = jnp.sin(phi)
    cp = jnp.cos(phi)
    ax2 = alphax * alphax
    ay2 = alphay * alphay
    denom = cp * cp / jnp.maximum(ax2, 1e-12) + sp * sp / jnp.maximum(ay2, 1e-12)
    cos_t = 1.0 / jnp.sqrt(1.0 + 1.0 / jnp.maximum(denom, 1e-12)
                           * u2 / jnp.maximum(1.0 - u2, 1e-7))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    t = normalize(tangent)
    b = jnp.cross(n, t)
    m = (sin_t * cp)[..., None] * t + (sin_t * sp)[..., None] * b \
        + cos_t[..., None] * n
    return normalize(m)


def _smith_g_iso(cos_wo, alpha2):
    """Smith mask-shadow G (the lambda form at src/reflection.cuh:256-258)."""
    cos_wo = jnp.maximum(jnp.abs(cos_wo), 1e-6)
    tan_wo = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_wo * cos_wo)) / cos_wo
    return 1.0 / (1.0 + (jnp.sqrt(1.0 + alpha2 * tan_wo * tan_wo) - 1.0) * 0.5)


def lambertian_sample(u1, u2, nl):
    """Cosine-weighted; beta = f*cos/pdf = albedo (applied by caller).
    (src/reflection.cuh:75-83)"""
    return cosine_sample_hemisphere(u1, u2, nl)


def specular_glass_sample(u1, into, raydir, nl, etaT):
    """Smooth dielectric: TIR + Fresnel-weighted reflect/refract
    (src/reflection.cuh:87-127). Returns (next_dir, refl_mask)."""
    eta = jnp.where(into, 1.0 / etaT, etaT)
    cos_i = jnp.abs(dot(nl, raydir))
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    # dielectric Fresnel with etaI=1, etaT=etaT arguments swapped by `into`
    # exactly like the inline block at src/reflection.cuh:110-115
    etaI_ = jnp.where(into, 1.0, etaT)
    etaT_ = jnp.where(into, etaT, 1.0)
    R1 = etaT_ * cos_i
    R2 = etaI_ * cos_t
    R3 = etaI_ * cos_i
    R4 = etaT_ * cos_t
    rp = (R1 - R2) / jnp.maximum(R1 + R2, 1e-12)
    rs = (R3 - R4) / jnp.maximum(R3 + R4, 1e-12)
    fresnel = (rp * rp + rs * rs) * 0.5
    tir = sin2_t >= 1.0
    refl = tir | (u1 <= fresnel)
    refl_dir = normalize(reflect(raydir, nl))
    refr_dir = normalize(eta[..., None] * raydir
                         + (eta * cos_i - cos_t)[..., None] * nl)
    next_dir = jnp.where(refl[..., None], refl_dir, refr_dir)
    return next_dir, refl


def ggx_reflection_sample(u1, u2, raydir, nl, tangent, F0, alphax, alphay):
    """GGX microfacet reflection, iso + aniso (macrofacetReflection,
    src/reflection.cuh:201-269). Returns (next_dir, beta[...,3])."""
    isotropic = alphax == alphay
    alphax2 = alphax * alphax
    alphay2 = alphay * alphay
    m_iso = _ggx_sample_normal_iso(u1, u2, alphax2, nl)
    m_aniso = _ggx_sample_normal_aniso(u1, u2, alphax, alphay, nl, tangent)
    m = jnp.where(isotropic[..., None], m_iso, m_aniso)

    next_dir = normalize(reflect(raydir, m))

    cos_wowh = jnp.maximum(0.01, jnp.abs(dot(m, next_dir)))
    F = fresnel_schlick(F0, cos_wowh)

    cos_wo = jnp.abs(dot(next_dir, nl))
    cos_wi = jnp.maximum(0.01, jnp.abs(dot(raydir, nl)))
    tan_wo = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_wo * cos_wo)) \
        / jnp.maximum(cos_wo, 1e-6)
    g_iso = 1.0 / (1.0 + (jnp.sqrt(1.0 + alphax2 * tan_wo * tan_wo) - 1.0) * 0.5)
    b_aniso = jnp.cross(nl, normalize(tangent))
    cos2_phi_wo = dot(jnp.cross(next_dir, nl), b_aniso) ** 2
    alpha_a = jnp.sqrt(cos2_phi_wo * alphax2 + (1.0 - cos2_phi_wo) * alphay2)
    at = alpha_a * tan_wo
    g_aniso = 1.0 / (1.0 + (jnp.sqrt(1.0 + at * at) - 1.0) * 0.5)
    G = jnp.where(isotropic, g_iso, g_aniso)

    cos_wh = jnp.maximum(0.01, dot(m, nl))
    beta = jnp.minimum(1.0, F * (G * cos_wowh / cos_wi / cos_wh)[..., None])
    return next_dir, beta


def rough_glass_sample(u1, u2, into, raydir, nl, etaT, alpha):
    """GGX rough dielectric (macrofacetGlass, src/reflection.cuh:329-386).
    Returns (next_dir, beta_scalar, refl_mask). NOTE the reference reuses r1
    for the reflect/refract decision — kept."""
    alpha2 = alpha * alpha
    m = _ggx_sample_normal_iso(u1, u2, alpha2, nl)

    eta = jnp.where(into, 1.0 / etaT, etaT)
    cos_i = jnp.abs(dot(m, raydir))
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    etaI_ = jnp.where(into, 1.0, etaT)
    etaT_ = jnp.where(into, etaT, 1.0)
    R1 = etaT_ * cos_i
    R2 = etaI_ * cos_t
    R3 = etaI_ * cos_i
    R4 = etaT_ * cos_t
    rp = (R1 - R2) / jnp.maximum(R1 + R2, 1e-12)
    rs = (R3 - R4) / jnp.maximum(R3 + R4, 1e-12)
    fresnel = (rp * rp + rs * rs) * 0.5

    refl = (sin2_t >= 1.0) | (u1 < fresnel)
    refl_dir = normalize(reflect(raydir, m))
    refr_dir = normalize(eta[..., None] * raydir
                         + (eta * cos_i - cos_t)[..., None] * m)
    next_dir = jnp.where(refl[..., None], refl_dir, refr_dir)

    cos_wo = jnp.abs(dot(next_dir, nl))
    cos_wi = jnp.maximum(0.01, jnp.abs(dot(raydir, nl)))
    tan_wo = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_wo * cos_wo)) \
        / jnp.maximum(cos_wo, 1e-6)
    G = 1.0 / (1.0 + (jnp.sqrt(1.0 + alpha2 * tan_wo * tan_wo) - 1.0) * 0.5)
    cos_wh = jnp.maximum(0.01, dot(m, nl))
    beta = jnp.minimum(1.0, G * cos_i / cos_wi / cos_wh)
    return next_dir, beta, refl


def microfacet_interface_sample(u1, u2, into, raydir, nl, etaT, alpha):
    """Entry interface sampler used by MAT_SUBSURFACE (microfacetSampling,
    src/reflection.cuh:271-327). Returns (sampled_normal, next_dir_on_refl,
    beta_scalar, refl_mask). For refraction lanes the BSSRDF machinery takes
    over (next_dir meaningless there)."""
    alpha2 = alpha * alpha
    rough = alpha > 1e-3
    m = jnp.where(rough[..., None],
                  _ggx_sample_normal_iso(u1, u2, alpha2, nl), nl)

    cos_i = jnp.abs(dot(m, raydir))
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    eta = jnp.where(into, 1.0 / etaT, etaT)
    sin2_t = eta * eta * sin2_i
    fresnel = fresnel_dielectric(cos_i, 1.0, etaT)
    refl = (sin2_t >= 1.0) | (u1 < fresnel)

    next_dir = normalize(reflect(raydir, m))

    cos_wo = jnp.abs(dot(next_dir, nl))
    cos_wi = jnp.maximum(0.01, jnp.abs(dot(raydir, nl)))
    tan_wo = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_wo * cos_wo)) \
        / jnp.maximum(cos_wo, 1e-6)
    G = 1.0 / (1.0 + (jnp.sqrt(1.0 + alpha2 * tan_wo * tan_wo) - 1.0) * 0.5)
    cos_wh = jnp.maximum(0.01, dot(m, nl))
    beta = jnp.where(rough,
                     jnp.minimum(1.0, G * cos_i / cos_wi / cos_wh), 1.0)
    return m, next_dir, beta, refl


def fresnel_blend_sample(u1, u2, u3, raydir, nl, Rd, Rs, alpha):
    """Ashikhmin-Shirley Fresnel blend (fresnelBlend,
    src/reflection.cuh:388-443), including its min(0.01, .) clamps.
    Returns (next_dir, beta[...,3])."""
    alpha2 = jnp.maximum(alpha * alpha, 1e-12)
    # diffuse branch
    d_dir = cosine_sample_hemisphere(u1, u2, nl)
    wh_d = d_dir - raydir
    # specular branch
    m = _ggx_sample_normal_iso(u1, u2, alpha2, nl)
    s_dir = reflect(raydir, m)

    diffuse = u3 < 0.5
    next_dir = jnp.where(diffuse[..., None], d_dir, s_dir)
    wh = jnp.where(diffuse[..., None], wh_d, m)
    wh = normalize(wh)
    next_dir = normalize(next_dir)

    wo = normalize(raydir)
    cos_wi = jnp.abs(dot(next_dir, nl))
    cos_wo = jnp.minimum(0.01, jnp.abs(dot(wo, nl)))   # reference quirk: min
    cos_wh = jnp.minimum(0.01, jnp.abs(dot(wh, nl)))   # reference quirk: min

    cos2_wh = cos_wh * cos_wh
    tan2_wh = (1.0 - cos2_wh) / jnp.maximum(cos2_wh, 1e-12)
    cos4_wh = cos2_wh * cos2_wh
    e = 1.0 + tan2_wh / alpha2
    D = 1.0 / (PI * alpha2 * jnp.maximum(cos4_wh * e * e, 1e-30))

    dot_wiwh = jnp.minimum(0.01, jnp.abs(dot(next_dir, wh)))  # quirk: min
    diff = (28.0 / (23.0 * PI)) * Rd * (1.0 - Rs) \
        * ((1.0 - pow5(1.0 - 0.5 * cos_wi))
           * (1.0 - pow5(1.0 - 0.5 * cos_wo)))[..., None]
    spec = (D / (4.0 * jnp.maximum(dot_wiwh, 1e-7)
                 * jnp.maximum(jnp.maximum(cos_wi, cos_wo), 1e-7)))[..., None] \
        * fresnel_schlick(Rs, dot_wiwh)
    f = spec + diff
    pdf = 0.5 * (cos_wi / PI + D / (4.0 * jnp.maximum(dot_wiwh, 1e-7)))
    beta = f * (cos_wi / jnp.maximum(pdf, 1e-20))[..., None]
    return next_dir, beta


def henyey_greenstein_sample(u1, u2, g, raydir):
    """HG phase function direction sample (src/reflection.cuh:131-150)."""
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1.0, g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
    cos_t = jnp.where(jnp.abs(g) < 1e-3,
                      1.0 - 2.0 * u1,
                      (1.0 + g * g - sqr * sqr) / (2.0 * g_safe))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = TWO_PI * u2
    v1, v2 = make_basis(raydir)
    return normalize((sin_t * jnp.cos(phi))[..., None] * v1
                     + (sin_t * jnp.sin(phi))[..., None] * v2
                     + cos_t[..., None] * raydir)
