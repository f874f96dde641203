"""The wavefront path integrator.

TPU re-architecture of the reference's per-pixel megakernel
(renderKernel, src/renderkernel.cu:472-855): the per-thread locals become SoA
columns over a lane axis, the bounce loop becomes a lax.while_loop whose body
is one wavefront iteration (intersect -> classify -> shade -> respawn), and
the material switch (src/renderkernel.cu:603-848) becomes branch-free: every
BSDF is evaluated for every lane (cheap VPU math) and the result selected by
material id — the heavy, gather-bound traversal runs exactly once per bounce.

Adaptive bounce budget matches the reference: start LIGHT_BOUNCE_NUM_MIN=2,
specular events extend by 1, hard cap LIGHT_BOUNCE_NUM_MAX=16
(src/renderkernel.cu:50-52,512,525,641,...).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.vecmath import (
    RAY_MIN, RAY_MAX, INV_PI, PI, dot, dotk, normalize, reflect, barycentric,
)

from ..core.rng import RaySampler
from ..scene.config import (
    MAT_EMIT, MAT_DIFF, MAT_GLASS, MAT_REFL, MAT_DIFF_REFL, MAT_FRESNEL,
    MAT_NULL, MAT_SUBSURFACE,
)
from ..scene.texture import sample_texture_quad, sample_envmap_quad
from ..materials.bsdf import (
    lambertian_sample, specular_glass_sample, ggx_reflection_sample,
    rough_glass_sample, microfacet_interface_sample, fresnel_blend_sample,
    henyey_greenstein_sample,
)
from .traverse import intersect_scene
from .medium import medium_interaction
from .bssrdf_shade import bssrdf_scatter


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (trace-time) configuration; the analog of the reference's
    compile-time macros (src/renderkernel.cu:45-54)."""
    bounce_min: int = 2
    bounce_max: int = 16
    use_envmap: bool = True
    use_texture: bool = True
    has_media: bool = False
    has_bssrdf: bool = False
    use_distant_light: bool = False
    stack_depth: int = 64
    bssrdf_probes: int = 3   # maxLoopNum, src/renderkernel.cu:727
    bssrdf_use_soe: bool = True  # USE_SOE, src/bssrdf.cuh:8
    # next-event estimation toward the envmap with MIS (BASELINE config 2);
    # the reference is BSDF-sampling-only, which fireflies on sun disks
    env_importance_sampling: bool = True
    # NEE draws restricted to the top-k brightest texels (pdf renormalized
    # over the subset, 0 elsewhere — unbiased under MIS; see
    # envsample.build_env_distribution for the two measured v5e reasons:
    # small-table gather cost + shadow-packet direction coherence).
    # <= 0 disables; envs with fewer texels are unaffected.
    env_nee_topk: int = 16384
    # integrator: "bounce" = classic full-width bounce loop, "regen" = path
    # regeneration (constant-width always-active pool; see tracer/regen.py)
    integrator: str = "regen"
    # pool ordering discipline: "inplace" respawns dead lanes where they
    # died (pool degrades into a pixel-mixed soup; traversal packets lose
    # spatial coherence), "compact" stable-compacts survivors to the front
    # each wave and appends fresh spawns at the tail, so a packet holds
    # lanes of mostly one spawn generation (consecutive queue samples =
    # consecutive swizzled pixels = one 32x32 tile neighborhood). The
    # classic wavefront compaction step (Laine et al.) as a pool
    # permutation.
    # Measured on v5e (1024^2 demo scene, ms per 1-spp frame): inplace 1494,
    # compact 910 (tile_sub=8) / 777 (tile_sub=16) — compaction restores the
    # packet coherence the global queue destroys, at the cost of one packed
    # pool permutation per wave. (A block-local-queue variant measured
    # worse still — numbers in ARCHITECTURE.md — and was deleted.)
    regen_order: str = "compact"
    # compact-permute implementation: "gather" = argsort + one (P,13-16)
    # row-gather (the round-2/3 form; per-index cost 21.7 ns at 1M rows),
    # "sort" = one stable 17-operand lax.sort moving every pool column as
    # a sort payload, with the pool's vector state carried as per-channel
    # (P,) PLANES so the sort's operands are the carry itself. The sort
    # form measured 1.6 ms standalone at 1M lanes in round 3 but LOST in
    # situ against a (P,3)-carried pool (239.3 vs 215.6 ms/frame at
    # 1024^2: slice/re-stack layout conversions around the sort); the
    # planar carry is the layout change that removes those conversions.
    regen_permute: str = "gather"
    # regen pool width cap (lanes), decoupled from the image: per-wave cost
    # is superlinear in pool size (the compact permute's per-index gather
    # cost cliffs with table row count — measured 1.9/10.4/21.7 ns per
    # index at 16k/131k/1M rows on v5e), so frames larger than the cap run
    # a fixed-width pool and take proportionally more waves; the sample
    # queue spans all pixels either way. <= 0 means image-sized (round-2
    # behavior). Must be a multiple of the packet block (tile_sub*128*
    # interleave) when it caps; 1M satisfies every shipped packet config.
    pool_lanes: int = 1 << 20
    # profiling hook (bench.py stage breakdown): duplicate ONE stage of the
    # regen wave and consume the copy with x0.0, so (t_dup - t_base) is that
    # stage's marginal in-situ cost — the only way to price a stage inside
    # a fused XLA program (deleting a stage instead lets XLA DCE shared
    # work and under-reports). "" = off; one of "ext_trace", "shadow_trace",
    # "permute", "scatter", "sample_env", "respawn", "fetch", "envmiss",
    # "texture", "shade".
    dup_stage: str = ""
    # image-accumulation discipline for the regen integrator: "deferred"
    # carries per-path radiance in three extra pool columns (rides the
    # compact permute ~free: the 13->16-col row gather is per-INDEX,
    # measured column-count-flat up to 16 on v5e) and scatter-adds only
    # the compacted dead TAIL window (pool/4 indices) when paths finish,
    # with a lax.cond full-pool flush on the rare wave where more than
    # pool/4 lanes die. "ring" (default) goes one step further: the dead
    # tail window is COPIED (contiguous dynamic_update_slice — bandwidth,
    # not per-index) into a 4x-pool-sized cross-wave ring and the
    # per-index image scatter runs only when the ring can't take another
    # window, so scattered indices track actual deaths (~1.14x/death vs
    # ~1.8x for the per-wave window; measured 218.9 -> 215.1 ms/frame at
    # 1024^2 on (32,4) packets, 214.2 -> 206.5 on (8,8)). "wave"
    # scatter-adds every lane's contribution every wave (round-2
    # behavior; the scatter is per-index, so it costs the full pool width
    # each wave). Deferral/ring need the compaction tail
    # (regen_order="compact"); "wave" is used otherwise.
    scatter_mode: str = "ring"
    # dense fresh-death flush: paths that die in the SAME wave that
    # spawned them (first-segment deaths — sky-direct pixels; ~45-55% of
    # all deaths on the demo scene) never enter the ring/scatter path at
    # all. Within the spawn window the queue->pool mapping is affine
    # (respawn hands dead-tail lanes consecutive sample ids), so their
    # banked radiance rides ONE dynamic-slice add into a pixel-ordered
    # dense buffer — bandwidth, not the ~10 ns/idx/ch per-index scatter
    # the ring drain pays. A 3-class compaction key (alive < fresh-dead <
    # old-dead) keeps the non-fresh deaths an exact tail suffix so the
    # ring banks and scatters only them. Requires deferred radiance
    # (scatter_mode "deferred"/"ring" + regen_order "compact").
    dense_fresh_flush: bool = True
    distant_light_L: tuple = (1.2, 1.2, 1.2)      # src/renderkernel.cu:521
    distant_light_dir: tuple = (0.0, 1.3, -3.6)   # src/renderkernel.cu:522
    # traversal backend: "packet" = Pallas packet kernel (TPU),
    # "wavefront" = pure-JAX per-lane step machine, "auto" = packet on TPU
    traversal: str = "auto"
    # sublane rows per packet (rays = x128). The step cost is scalar-bound,
    # so fatter packets cut total steps; with the compact pool the larger
    # union footprint stays cheap. The optimum tracks the pool's packet
    # coherence: SMEM-table era with octant ordering favored (32,4)
    # ((16,4) 337, (32,4) 312, (64,2) 363, (8,8) 335 ms/frame at 1024^2);
    # the round-3 exact-hit-slot survivor ordering shifts it to (8,8) —
    # (32,4) 219.7, (8,8) 215.0, (16,8) 224.7, (32,1) 247.8, (64,1)
    # 252.2, (128,1) 302.5; at 1080p (8,8) 562.7 vs (32,4) 572.3.
    # Narrower packets waste fewer union-footprint steps once packets are
    # this coherent, and 8-way interleave still hides the scalar chain.
    packet_tile_sub: int = 8
    # independent packets interleaved per kernel instance (scalar-latency
    # hiding; see ops/traverse_packet.py — interleave=1 kills the +51%
    # interleave tax by construction but loses MORE to exposed scalar
    # latency: measured numbers above)
    packet_interleave: int = 8
    # traversal step body: "fused" computes node-slab AND triangle-Woop
    # math every step branch-free; "branch" switches on the cursor
    # (dead/node/tri), halving VPU work per step and making a finished
    # packet's steps near-free at the cost of one scalar multi-way branch
    # per step. Measured on v5e: branch wins STANDALONE decisively
    # (coherent 631 -> 988 Mrays/s, incoherent 95 -> 128, oracle-gated
    # exact) but loses ~6 ms/frame IN SITU on the hit-slot-ordered real
    # population (fused 220.1 vs branch 225.6+ ms at 1024^2), where
    # packets of an instance finish together and the branch only costs —
    # so fused is the integrator default and branch serves
    # coherent-primary-style workloads.
    packet_step: str = "fused"
    # work-queue traversal (ops/traverse_packet._queue_kernel): each kernel
    # instance owns packet_queue_k consecutive packets and `interleave`
    # step slots that greedily claim the next packet when theirs finishes,
    # so the straggler tax is paid once per instance instead of once per
    # interleave group. Offline on the real mid-frame population the tax
    # drops from +73-89% (fixed grouping) to +14% at k=64 / +7% at k=128
    # (tools/eval_rebalance_offline.py; packet step counts are heavy-tailed
    # and unpredictable at compaction time — 63-72% of lanes respawn fresh
    # every wave, so rebalancing-by-predictor is impossible and the queue
    # is the structural fix). In situ at (8,8): k=64 197.9 ms/frame at
    # 1024^2 vs 204.2 fixed (1080p: 508.0 vs 550.8); il=16,k=64 213.5 and
    # tile_sub=16/32 variants 203-215 all lose. <= interleave keeps the
    # fixed grouping. After the kernel slimming (ood recomputed in-kernel,
    # scalar-SMEM tmin, no done-carry on closest-hit — 15 -> 11 ray
    # operands) the optimum moved UP: k=128's blocks now fit without
    # VMEM pressure and win — 177.8 ms at 1024^2 / 456.5 at 1080p vs
    # 183.7/— at k=64, 179.9 at k=96; k=192/256 lose again (194.0/194.9,
    # the raised VMEM cap costs more than the smaller tax saves).
    packet_queue_k: int = 128
    # extension-trace active set as a lane-PREFIX count: the regen pool is
    # an exact prefix after compaction + rank-ordered respawn, so the
    # queue kernel derives act/tmax from two SMEM scalars + a
    # loop-invariant lane iota instead of re-reading a (sub,128) tmax tile
    # per slot-step (1 of 10 per-step VMEM loads) — and the caller's
    # full-width tmax_enc prep fusion disappears. Off = round-3 behavior
    # (tmax operand). Only affects the closest-hit queue path.
    trace_active_prefix: bool = True
    # anyhit (NEE shadow) packets stop as soon as every lane has found an
    # occluder — a full cross-lane reduction on EVERY tri step (72% of
    # steps). Off (default) trades later packet termination for a cheaper
    # step and WINS on the real population: 436.1 -> 425.4 ms/frame at
    # 1080p, 160.4 -> 158.7 at 1024^2 (the reduce sits on the scalar
    # critical path; once every lane is done the votes are empty and the
    # packet pops out in a few cheap steps anyway). Results are
    # bit-identical either way (a done lane never votes).
    anyhit_early_stop: bool = False
    # packed-stream residency for the packet kernel: "auto" = SMEM when the
    # table fits the 700 KB budget, else VMEM; "split" = BFS hot prefix in
    # SMEM + full stream in VMEM (reference-asset-scale scenes);
    # "smem"/"vmem" force one side (see ops/traverse_packet.py)
    packet_table_mem: str = "auto"
    # merged env+texture per-wave gather (wavefront.env_tex_merged): the
    # env-miss and texture fetches are mutually exclusive per lane, so one
    # gather on the concatenated table serves both — 13.3 vs 26.9 ms per
    # 1M random idx standalone (tools/probe_gmerge.py). Off = the two
    # separate full-width gathers (round-4 form), for A/B.
    merge_envtex: bool = True
    # dependent traversal steps per while-loop iteration: the step is
    # scalar-bound, so the loop-control + carry-shuffle overhead paid once
    # per iteration is a real per-step component; unroll=k pays it once
    # per k steps (SENTINEL is a fixed point, so a packet finishing
    # mid-group idles <= k-1 no-op sub-steps). VERDICT r04 #4's
    # half-the-iterations shape, without a second fetch port.
    packet_step_unroll: int = 1


def trace_rays(scene, settings: RenderSettings, orig, raydir, tmin, tmax,
               anyhit=False, active=None, active_prefix=None):
    """Traversal dispatch: Pallas packet kernel on TPU, pure-JAX step
    machine elsewhere.

    active_prefix: optional traced scalar asserting the active set is the
    exact lane prefix [0, n) (the regen pool's compaction + rank-ordered
    respawn invariant). The packet queue kernel exploits it to drop its
    tmax operand (one fewer per-step VMEM re-read); other paths use the
    plain `active` mask, which the caller must still pass."""
    mode = settings.traversal
    if mode == "auto":
        mode = "packet" if jax.default_backend() == "tpu" else "wavefront"
    if mode == "packet" and "packed" in scene:
        from ..ops.traverse_packet import packet_intersect
        use_prefix = (active_prefix is not None and not anyhit
                      and settings.trace_active_prefix
                      and settings.packet_queue_k
                      > settings.packet_interleave
                      and jnp.ndim(tmax) == 0)
        return packet_intersect(
            scene["packed"], orig, raydir, tmin, tmax, anyhit=anyhit,
            stack_depth=settings.stack_depth,
            active=None if use_prefix else active,
            active_prefix=active_prefix if use_prefix else None,
            tile_sub=settings.packet_tile_sub,
            interleave=settings.packet_interleave,
            step_mode=settings.packet_step,
            queue_k=settings.packet_queue_k,
            table_mem=settings.packet_table_mem,
            step_unroll=settings.packet_step_unroll,
            anyhit_early_stop=settings.anyhit_early_stop)
    return intersect_scene(
        scene["prims"], scene["meta"], scene["num_nodes"], orig, raydir,
        tmin, tmax, anyhit=anyhit, stack_depth=settings.stack_depth,
        active=active, tile_size=None)


def pack_tri_attributes(tri_pos, tri_uv, tri_nrm, tri_mat,
                        prims=None, num_nodes=0):
    """Pack the per-slot attribute streams into one (Kt,28) array so the
    shading stage pays ONE gather per lane instead of five (gathers inside
    the bounce loop cost ~0.26 ms / 64k lanes on TPU — they dominate if not
    fused). Columns: pos[0:9] uv[9:15] nrm[15:24] mat[24] (bitcast)
    geo_n[25:28].

    geo_n precomputes woop_geometric_normal's cross(m1.xyz, m2.xyz) per
    slot from the unified stream's Woop rows (bit-identical inputs and
    f32 ops), removing a second full-width (1M,12) row-gather chain from
    every wave — the profiler priced that chain at ~6.7 ms/frame at
    1024^2 (tools/profile_frame.py). prims=None (tests/back-compat)
    leaves the geo_n columns zero."""
    import numpy as np
    Kt = tri_pos.shape[0]
    out = np.zeros((Kt, 28), np.float32)
    out[:, 0:9] = tri_pos
    out[:, 9:15] = tri_uv
    out[:, 15:24] = tri_nrm
    out[:, 24] = np.asarray(tri_mat, np.int32).view(np.float32)
    if prims is not None:
        p = np.asarray(prims[num_nodes:num_nodes + Kt], np.float32)
        out[:, 25:28] = np.cross(p[:, 4:7], p[:, 8:11])
    return out


def fetch_attributes(scene, hit_slot, hitpoint):
    """Barycentric-interpolated uv + smooth normal + geometric normal at
    the hit (textureFetching, src/renderkernel.cu:440-466 + the :392
    Woop-row cross). Single packed gather.
    Returns (hit_uv, smooth_n, mat_id, tri_n); tri_n is zero on miss
    lanes, matching woop_geometric_normal."""
    safe = jnp.maximum(hit_slot, 0)
    a = jnp.take(scene["tri_attr"], safe, axis=0)      # [N,28]
    p0, p1, p2 = a[:, 0:3], a[:, 3:6], a[:, 6:9]
    u, v, w = barycentric(hitpoint, p0, p1, p2)
    hit_uv = (u[:, None] * a[:, 9:11] + v[:, None] * a[:, 11:13]
              + w[:, None] * a[:, 13:15])
    smooth_n = (u[:, None] * a[:, 15:18] + v[:, None] * a[:, 18:21]
                + w[:, None] * a[:, 21:24])
    mat_id = jax.lax.bitcast_convert_type(a[:, 24], jnp.int32)
    tri_n = jnp.where((hit_slot >= 0)[:, None], a[:, 25:28], 0.0)
    return hit_uv, smooth_n, mat_id, tri_n


# material table column layout (see materials_to_arrays / pack_mat_table)
_MAT_COLS = {
    "refltype": (0, 1), "objcol": (1, 4), "emit": (4, 7), "alphax": (7, 8),
    "alphay": (8, 9), "kd": (9, 10), "ks": (10, 11), "etaT": (11, 12),
    "useNormal": (12, 13), "useTexture": (13, 14), "F0": (14, 17),
    "tangent": (17, 20), "mfp": (20, 23), "med_sigma_s": (23, 26),
    "med_sigma_a": (26, 29), "med_g": (29, 30), "has_medium": (30, 31),
}
_INT_MAT_COLS = ("refltype", "useNormal", "useTexture", "has_medium")


def pack_mat_table(mat_arrays):
    """Pack material SoA columns into one (M,31) f32 table."""
    import numpy as np
    M = mat_arrays["refltype"].shape[0]
    t = np.zeros((M, 31), np.float32)
    for k, (a, b) in _MAT_COLS.items():
        v = np.asarray(mat_arrays[k], np.float32)
        t[:, a:b] = v.reshape(M, b - a)
    return t


def gather_material(scene, mat_id):
    """Fetch per-lane material params. Material counts are tiny (<= dozens),
    so instead of a gather this is a one-hot matmul against the packed
    (M,31) table — pure MXU/VPU work, no gather at all (the branch-free
    analog of the gpuMatDesc fetch at src/renderkernel.cu:570-582)."""
    table = scene["mat_table"]                     # (M,31)
    M = table.shape[0]
    oh = (mat_id[:, None] == jnp.arange(M, dtype=jnp.int32)[None, :])
    rows = jnp.dot(oh.astype(jnp.float32), table,
                   preferred_element_type=jnp.float32)  # (N,31)
    m = {}
    for k, (a, b) in _MAT_COLS.items():
        v = rows[:, a:b] if b - a > 1 else rows[:, a]
        if k in _INT_MAT_COLS:
            v = v.astype(jnp.int32)
        m[k] = v
    return m


def env_radiance(scene, settings: RenderSettings, raydir, env_rotation):
    if settings.use_envmap:
        return sample_envmap_quad(scene["envmap_quad"], scene["env_h"],
                                  scene["env_w"], raydir, env_rotation)
    return jnp.broadcast_to(scene["env_const"], raydir.shape)


def env_miss_weighted(scene, settings: RenderSettings, raydir, bsdf_pdf,
                      env_rotation):
    """Environment radiance already weighted by the BSDF-side MIS factor.

    bsdf_pdf: per-lane solid-angle pdf of the draw that produced `raydir`
    at the previous diffuse vertex, or a NEGATIVE sentinel when no env
    next-event estimation happened there (weight 1). The sampler pdf comes
    out of the SAME quad-row gather as the radiance (cols 12:16, see
    texture.sample_envmap_quad_pdf) — this replaces the separate
    ~8 ms/wave env_pdf_of_dir gather the integrators used to pay on every
    iteration, with bit-identical results."""
    if not settings.use_envmap:
        return jnp.broadcast_to(scene["env_const"], raydir.shape)
    if not settings.env_importance_sampling:
        return env_radiance(scene, settings, raydir, env_rotation)
    from ..scene.texture import sample_envmap_quad_pdf
    from .envsample import power_heuristic
    L, p_uv = sample_envmap_quad_pdf(
        scene["envmap_quad"], scene["env_h"], scene["env_w"], raydir,
        env_rotation)
    y = raydir[:, 1]
    sin_t = jnp.sqrt(jnp.maximum(1.0 - y * y, 1e-8))
    pdf_e = p_uv / (2.0 * PI * PI * sin_t)
    w = jnp.where(bsdf_pdf < 0.0, 1.0, power_heuristic(bsdf_pdf, pdf_e))
    return w[:, None] * L


def texture_radiance(scene, hit_uv):
    return sample_texture_quad(scene["texture_quad"], scene["tex_h"],
                               scene["tex_w"], hit_uv[:, 0], hit_uv[:, 1])


def pack_envtex_quad(env_quad16, tex_quad12):
    """Concatenate the 16-col env quad table and the (zero-padded) 12-col
    texture quad table into ONE gather target. A pool lane is either a
    MISS (env fetch) or a SURFACE hit (texture fetch) — the two full-width
    per-wave gathers are mutually exclusive per lane, and a 1M-idx gather
    costs the same on the merged 196k-row table as on either source table
    alone (13.3 vs 13.7/13.5 ms per 1M random idx on v5e,
    tools/probe_gmerge.py) — so merging halves the env+texture gather
    cost outright. Env rows come first; texture row r sits at
    env_h*env_w + r."""
    import numpy as np
    e = np.asarray(env_quad16, np.float32)
    t = np.asarray(tex_quad12, np.float32)
    out = np.zeros((e.shape[0] + t.shape[0], 16), np.float32)
    out[:e.shape[0]] = e
    out[e.shape[0]:, :12] = t
    return out


def env_tex_merged(scene, settings: RenderSettings, raydir, bsdf_pdf,
                   env_rotation, miss, hit_uv):
    """MIS-weighted env-miss radiance AND texture radiance from ONE gather
    on the merged envtex_quad table (see pack_envtex_quad).

    Returns (env_weighted_L [N,3], tex_rgb [N,3]) with values bit-identical
    to env_miss_weighted / texture_radiance: the per-lane interpolation
    math is the same op sequence, only the row SOURCE is merged (a miss
    lane's row holds the env quad, any other lane's the texture quad; each
    consumer is already masked to its own lane class). Requires envmap
    importance sampling (the 16-col env rows carry pdf_uv in cols 12:16)."""
    from ..scene.texture import _uv_from_dir
    from .envsample import power_heuristic
    He, We = scene["env_h"], scene["env_w"]
    Ht, Wt = scene["tex_h"], scene["tex_w"]
    KE = He * We
    # env indexing (clamp) — the sample_envmap_quad_pdf address math
    u_e, v_e = _uv_from_dir(raydir, env_rotation)
    xe = u_e * We - 0.5
    ye = v_e * He - 0.5
    xe0 = jnp.floor(xe)
    ye0 = jnp.floor(ye)
    fxe = (xe - xe0)[..., None]
    fye = (ye - ye0)[..., None]
    xe0i = jnp.clip(xe0.astype(jnp.int32), 0, We - 1)
    ye0i = jnp.clip(ye0.astype(jnp.int32), 0, He - 1)
    env_row = ye0i * We + xe0i
    # texture indexing (wrap) — the sample_texture_quad address math.
    # Miss lanes can carry non-finite hit_uv (hitpoint at t=RAY_MAX); their
    # int casts are backend-defined but finite, the mod keeps the row in
    # range, and the where() below never selects it.
    u_t = jnp.mod(hit_uv[:, 0], 1.0)
    v_t = jnp.mod(hit_uv[:, 1], 1.0)
    xt = u_t * Wt - 0.5
    yt = v_t * Ht - 0.5
    xt0 = jnp.floor(xt)
    yt0 = jnp.floor(yt)
    fxt = (xt - xt0)[..., None]
    fyt = (yt - yt0)[..., None]
    xt0i = jnp.mod(xt0.astype(jnp.int32), Wt)
    yt0i = jnp.mod(yt0.astype(jnp.int32), Ht)
    tex_row = KE + yt0i * Wt + xt0i

    q = jnp.take(scene["envtex_quad"], jnp.where(miss, env_row, tex_row),
                 axis=0)                                   # [N,16]
    L = (q[..., 0:3] * (1 - fxe) * (1 - fye) + q[..., 3:6] * fxe * (1 - fye)
         + q[..., 6:9] * (1 - fxe) * fye + q[..., 9:12] * fxe * fye)
    sx = jnp.clip((u_e * We).astype(jnp.int32) - xe0i, 0, 1)
    sy = jnp.clip((v_e * He).astype(jnp.int32) - ye0i, 0, 1)
    p00, p01 = q[..., 12], q[..., 13]
    p10, p11 = q[..., 14], q[..., 15]
    p_uv = jnp.where(sy == 0, jnp.where(sx == 0, p00, p01),
                     jnp.where(sx == 0, p10, p11))
    y = raydir[:, 1]
    sin_t = jnp.sqrt(jnp.maximum(1.0 - y * y, 1e-8))
    pdf_e = p_uv / (2.0 * PI * PI * sin_t)
    w = jnp.where(bsdf_pdf < 0.0, 1.0, power_heuristic(bsdf_pdf, pdf_e))
    env_L = w[:, None] * L
    tex_L = (q[..., 0:3] * (1 - fxt) * (1 - fyt)
             + q[..., 3:6] * fxt * (1 - fyt)
             + q[..., 6:9] * (1 - fxt) * fyt + q[..., 9:12] * fxt * fyt)
    return env_L, tex_L


def shade(scene, settings, rng, raydir, n, nl, into, mat, objcol):
    """Evaluate all material branches and select by refltype.

    Returns (rng, next_dir, mask_mul [N,3], offset_steps [N] — the multiple of
    RAY_MIN*nl added to the hitpoint, terminate [N], bounce_inc [N],
    refract_glass [N] — lanes that refracted through a medium interface)."""
    N = raydir.shape[0]
    rng, (u1, u2, u3, u4, u5, u6) = RaySampler.next_n(rng, 6)
    refl_t = mat["refltype"]
    one3 = jnp.ones((N, 3), jnp.float32)

    # --- MAT_DIFF (src/renderkernel.cu:604-639) ---
    d_dir = lambertian_sample(u1, u2, nl)
    d_mul = mat["kd"][:, None] * objcol
    # --- MAT_REFL (:640-655); mirror offsets twice (quirk kept) ---
    mirror = mat["alphax"] == 0.0
    mir_dir = normalize(reflect(raydir, n))
    g_dir, g_beta = ggx_reflection_sample(
        u1, u2, raydir, nl, mat["tangent"], mat["F0"],
        mat["alphax"], mat["alphay"])
    r_dir = jnp.where(mirror[:, None], mir_dir, g_dir)
    r_mul = jnp.where(mirror[:, None],
                      mat["ks"][:, None] * objcol,
                      mat["ks"][:, None] * g_beta * objcol)
    r_off = jnp.where(mirror, 2.0, 1.0)
    # --- MAT_DIFF_REFL (:656-669) ---
    dr_spec = u5 < mat["ks"] / jnp.maximum(mat["ks"] + mat["kd"], 1e-7)
    dr_dir = jnp.where(dr_spec[:, None], g_dir, d_dir)
    dr_mul = jnp.where(dr_spec[:, None], g_beta, objcol)
    # --- MAT_FRESNEL (:670-675) ---
    f_dir, f_beta = fresnel_blend_sample(
        u1, u2, u3, raydir, nl, mat["kd"][:, None] * objcol, mat["F0"],
        mat["alphax"])
    # --- MAT_GLASS (:676-694) ---
    sg_dir, sg_refl = specular_glass_sample(u1, into, raydir, nl, mat["etaT"])
    rg_dir, rg_beta, rg_refl = rough_glass_sample(
        u1, u2, into, raydir, nl, mat["etaT"], mat["alphax"])
    smooth = mat["alphax"] == 0.0
    gl_refl = jnp.where(smooth, sg_refl, rg_refl)
    gl_dir = jnp.where(smooth[:, None], sg_dir, rg_dir)
    eta2 = mat["etaT"] * mat["etaT"]
    rg_mul = rg_beta[:, None] * objcol \
        * jnp.where((~rg_refl & ~into)[:, None], eta2[:, None], 1.0)
    gl_mul = jnp.where(smooth[:, None], one3, rg_mul)
    gl_off = jnp.where(gl_refl, 1.0, -1.0)
    # --- MAT_SUBSURFACE entry interface (:698-707) ---
    ss_m, ss_rdir, ss_beta, ss_refl = microfacet_interface_sample(
        u1, u2, into, raydir, nl, mat["etaT"], mat["alphax"])
    ss_refl_mul = ss_beta[:, None] * mat["ks"][:, None] * objcol

    # select by material id
    next_dir = d_dir
    next_dir = jnp.where((refl_t == MAT_REFL)[:, None], r_dir, next_dir)
    next_dir = jnp.where((refl_t == MAT_DIFF_REFL)[:, None], dr_dir, next_dir)
    next_dir = jnp.where((refl_t == MAT_FRESNEL)[:, None], f_dir, next_dir)
    next_dir = jnp.where((refl_t == MAT_GLASS)[:, None], gl_dir, next_dir)
    next_dir = jnp.where((refl_t == MAT_SUBSURFACE)[:, None], ss_rdir, next_dir)
    next_dir = jnp.where((refl_t == MAT_NULL)[:, None], raydir, next_dir)

    mask_mul = d_mul
    mask_mul = jnp.where((refl_t == MAT_REFL)[:, None], r_mul, mask_mul)
    mask_mul = jnp.where((refl_t == MAT_DIFF_REFL)[:, None], dr_mul, mask_mul)
    mask_mul = jnp.where((refl_t == MAT_FRESNEL)[:, None], f_beta, mask_mul)
    mask_mul = jnp.where((refl_t == MAT_GLASS)[:, None], gl_mul, mask_mul)
    mask_mul = jnp.where((refl_t == MAT_SUBSURFACE)[:, None], ss_refl_mul, mask_mul)
    mask_mul = jnp.where((refl_t == MAT_NULL)[:, None], one3, mask_mul)

    offset = jnp.ones((N,), jnp.float32)
    offset = jnp.where(refl_t == MAT_REFL, r_off, offset)
    offset = jnp.where(refl_t == MAT_DIFF_REFL, 0.0, offset)
    offset = jnp.where(refl_t == MAT_FRESNEL, 0.0, offset)
    offset = jnp.where(refl_t == MAT_GLASS, gl_off, offset)
    offset = jnp.where(refl_t == MAT_SUBSURFACE, 1.0, offset)
    offset = jnp.where(refl_t == MAT_NULL, -1.0, offset)

    terminate = refl_t == MAT_EMIT

    bounce_inc = jnp.zeros((N,), jnp.int32)
    is_specular_event = (
        (refl_t == MAT_REFL)
        | ((refl_t == MAT_DIFF_REFL) & dr_spec)
        | (refl_t == MAT_FRESNEL)
        | (refl_t == MAT_GLASS)
        | ((refl_t == MAT_SUBSURFACE) & ss_refl))
    bounce_inc = is_specular_event.astype(jnp.int32)

    # lanes entering a refractive interface (for medium tracking)
    glass_refract = (refl_t == MAT_GLASS) & ~gl_refl
    ss_refract = (refl_t == MAT_SUBSURFACE) & ~ss_refl

    aux = {
        "glass_refract": glass_refract,
        "ss_refract": ss_refract,
        "ss_normal": ss_m,
        "u": (u1, u2, u3, u4, u5, u6),
    }
    return rng, next_dir, mask_mul, offset, terminate, bounce_inc, aux


def make_integrator(settings: RenderSettings):
    """Build the jit-able integrator body closed over static settings."""

    def integrate(scene, rng, orig, raydir, cam_env_rotation):
        """Trace paths to completion. orig/raydir: [N,3] primary rays.
        Returns (rng, radiance [N,3])."""
        N = orig.shape[0]
        mask = jnp.ones((N, 3), jnp.float32)
        accum = jnp.zeros((N, 3), jnp.float32)
        active = jnp.ones((N,), bool)
        light_bounce_num = jnp.full((N,), settings.bounce_min, jnp.int32)
        bounce = jnp.int32(0)
        # medium state: material id of the medium the ray is inside (-1 none)
        medium_id = jnp.full((N,), -1, jnp.int32)

        def cond(st):
            return jnp.any(st["active"]) & (st["bounce"] < settings.bounce_max)

        def body(st):
            rng = st["rng"]
            orig = st["orig"]
            raydir = st["raydir"]
            mask = st["mask"]
            accum = st["accum"]
            active = st["active"]
            lbn = st["lbn"]
            medium_id = st["medium_id"]

            hit_slot, hit_t = trace_rays(
                scene, settings, orig, raydir, RAY_MIN, RAY_MAX,
                anyhit=False, active=active)

            # ---------- participating media (wired-in HomogeneousMedium,
            # src/reflection.cuh:152-197) ----------
            if settings.has_media:
                rng, orig, raydir, mask, sampled_medium = medium_interaction(
                    scene, rng, orig, raydir, mask, hit_t, medium_id, active)
                # scattering inside a medium extends the bounce budget (like
                # the reference's specular events); dense media need many
                # scatter events to cross
                lbn = jnp.where(sampled_medium,
                                jnp.minimum(lbn + 1, settings.bounce_max),
                                lbn)
            else:
                sampled_medium = jnp.zeros((N,), bool)

            surf = active & ~sampled_medium

            # ---------- environment miss (src/renderkernel.cu:553-557) ----
            # DEFERRED: each lane reaches the environment at most once, so
            # record (direction, throughput) here and evaluate the envmap
            # once after the bounce loop instead of paying its bilinear
            # gather every iteration.
            miss = surf & (hit_t > 1e10)
            miss_dir = jnp.where(miss[:, None], raydir, st["miss_dir"])
            # bsdf_pdf carries the pdf of the draw that produced this ray
            # when the previous vertex also did env next-event estimation
            # (negative = no NEE there, MIS weight 1); the weight itself is
            # applied in the single deferred env fetch after the loop
            miss_mask = jnp.where(miss[:, None], mask, st["miss_mask"])
            miss_bpdf = jnp.where(miss, st["bsdf_pdf"], st["miss_bpdf"])
            active = active & ~miss
            surf = surf & ~miss

            # ---------- surface interaction ----------
            hitpoint = orig + raydir * hit_t[:, None]
            hit_uv, smooth_n, mat_id, tri_n = fetch_attributes(
                scene, hit_slot, hitpoint)
            mat = gather_material(scene, mat_id)
            use_sn = mat["useNormal"] != 0
            n = normalize(jnp.where(use_sn[:, None], smooth_n, tri_n))

            objcol = mat["objcol"]
            if settings.use_texture:
                tex = texture_radiance(scene, hit_uv)
                objcol = jnp.where((mat["useTexture"] != 0)[:, None], tex, objcol)

            into = dot(n, raydir) < 0.0
            nl = jnp.where(into[:, None], n, -n)

            # emission (src/renderkernel.cu:600)
            accum = accum + jnp.where(surf[:, None], mask * mat["emit"], 0.0)

            rng, next_dir, mask_mul, offset, term, binc, aux = shade(
                scene, settings, rng, raydir, n, nl, into, mat, objcol)

            # ---------- BSSRDF probe machinery ----------
            if settings.has_bssrdf:
                ss_lanes = surf & aux["ss_refract"]
                (rng, bs_orig, bs_dir, bs_mul, bs_ok, bs_is_mul,
                 bs_normal) = bssrdf_scatter(
                    scene, settings, rng, hitpoint, aux["ss_normal"], mat,
                    mat_id, objcol, ss_lanes)
                # lanes whose probe found a surface continue from there;
                # failed probes fall back to the entry reflection branch with
                # beta*ks*objcol (src/renderkernel.cu:785-789) — that is what
                # shade() already produced in mask_mul for ss lanes.
                use_bs = ss_lanes & bs_ok
            else:
                use_bs = jnp.zeros((N,), bool)
                bs_orig = hitpoint
                bs_dir = next_dir
                bs_mul = mask_mul
                bs_is_mul = mask_mul
                bs_normal = nl

            new_orig = hitpoint + nl * (offset * RAY_MIN)[:, None]
            new_orig = jnp.where(use_bs[:, None], bs_orig, new_orig)
            new_dir = jnp.where(use_bs[:, None], bs_dir, next_dir)
            new_mul = jnp.where(use_bs[:, None], bs_mul, mask_mul)

            mask_prev = mask
            mask = jnp.where(surf[:, None], mask * new_mul, mask)
            orig = jnp.where(surf[:, None], new_orig, orig)
            raydir = jnp.where(surf[:, None], new_dir, raydir)

            # ---------- envmap next-event estimation + MIS ----------
            bsdf_pdf = st["bsdf_pdf"]
            if settings.use_envmap and settings.env_importance_sampling:
                from .envsample import sample_env, power_heuristic
                rng, (e1, e2) = RaySampler.next_n(rng, 2)
                d_env, pdf_env, L_env = sample_env(scene, e1, e2,
                                                   cam_env_rotation)
                cos_e = dot(d_env, nl)
                diff_lane = surf & (mat["refltype"] == MAT_DIFF)
                cand = diff_lane & (cos_e > 0.0) & (pdf_env > 1e-12)
                s_slot, s_t = trace_rays(scene, settings, orig, d_env,
                                         RAY_MIN, RAY_MAX, anyhit=True,
                                         active=cand)
                lit = cand & (s_t > 1e10)
                f = mat["kd"][:, None] * objcol * INV_PI
                pdf_b = jnp.maximum(cos_e, 0.0) * INV_PI
                w = power_heuristic(pdf_env, pdf_b)
                scale = cos_e / jnp.maximum(pdf_env, 1e-12) * w
                accum = accum + jnp.where(
                    lit[:, None], mask_prev * f * scale[:, None] * L_env, 0.0)
                # record the BSDF pdf of the new direction on diffuse
                # lanes; the complementary MIS weight is computed at the
                # deferred env fetch (env pdf rides the same quad gather)
                cos_n = jnp.maximum(dot(raydir, nl), 0.0)
                pdf_bn = cos_n * INV_PI
                bsdf_pdf = jnp.where(
                    surf & diff_lane, pdf_bn,
                    jnp.where(surf, -1.0, bsdf_pdf))

            # ---------- distant light importance sampling ----------
            # (USE_DISTANT_LIGHT, src/renderkernel.cu:54,611-636,815-841:
            # MAT_DIFF and BSSRDF-exit lanes fire a shadow ray toward the
            # fixed distant light and add a power-heuristic-weighted term.
            # Note the reference multiplies the already-albedo-scaled mask
            # by f = objcol/pi again — quirk kept.)
            if settings.use_distant_light:
                from ..materials.fresnel import (
                    fresnel_dielectric, fresnel_moment_1)
                ddis = normalize(jnp.asarray(settings.distant_light_dir,
                                             jnp.float32))
                ldis = jnp.asarray(settings.distant_light_L, jnp.float32)
                diff_lane = surf & (mat["refltype"] == MAT_DIFF)
                cos_th = dot(jnp.broadcast_to(ddis, raydir.shape), nl)
                cand = diff_lane & (cos_th >= 0.0)
                # BSSRDF exit points also sample the distant light
                # (src/renderkernel.cu:815-841)
                bs_lane = surf & use_bs
                cos_b = dot(jnp.broadcast_to(ddis, raydir.shape),
                            normalize(bs_normal))
                cand_b = bs_lane & (cos_b >= 0.0)
                s_slot, s_t = trace_rays(
                    scene, settings, orig, jnp.broadcast_to(ddis, raydir.shape),
                    RAY_MIN, RAY_MAX, anyhit=True, active=cand | cand_b)
                lit = cand & (s_t > 1e10)
                f = objcol * INV_PI
                light_pdf = 1.0
                scat_pdf = jnp.abs(cos_th) * INV_PI
                w = (scat_pdf + light_pdf) / (scat_pdf * scat_pdf
                                              + light_pdf * light_pdf)
                contrib = mask * f * ldis * w[:, None]
                accum = accum + jnp.where(lit[:, None], contrib, 0.0)
                lit_b = cand_b & (s_t > 1e10)
                eta_t = mat["etaT"]
                surface_f = ((1.0 - fresnel_dielectric(
                    jnp.abs(cos_b), 1.0, eta_t))
                    / (1.0 - 2.0 * fresnel_moment_1(1.0 / eta_t))) * INV_PI
                pdf_b2 = jnp.abs(cos_b) * INV_PI
                w_b = (pdf_b2 + 1.0) / (pdf_b2 * pdf_b2 + 1.0)
                accum = accum + jnp.where(
                    lit_b[:, None],
                    mask_prev * bs_is_mul * (surface_f * w_b)[:, None] * ldis,
                    0.0)
            lbn = jnp.where(surf, jnp.minimum(
                lbn + binc, settings.bounce_max), lbn)
            active = active & ~(surf & term)

            # medium tracking: entering/leaving refractive interfaces
            if settings.has_media:
                entered = surf & aux["glass_refract"] & into \
                    & (mat["has_medium"] != 0)
                left = surf & aux["glass_refract"] & ~into
                medium_id = jnp.where(entered, mat_id, medium_id)
                medium_id = jnp.where(left, -1, medium_id)

            bounce = st["bounce"] + 1
            active = active & (bounce < lbn)
            return {
                "rng": rng, "orig": orig, "raydir": raydir, "mask": mask,
                "accum": accum, "active": active, "lbn": lbn,
                "bounce": bounce, "medium_id": medium_id,
                "miss_dir": miss_dir, "miss_mask": miss_mask,
                "miss_bpdf": miss_bpdf, "bsdf_pdf": bsdf_pdf,
            }

        st = {
            "rng": rng, "orig": orig, "raydir": raydir, "mask": mask,
            "accum": accum, "active": active, "lbn": light_bounce_num,
            "bounce": bounce, "medium_id": medium_id,
            "miss_dir": jnp.zeros((N, 3), jnp.float32),
            "miss_mask": jnp.zeros((N, 3), jnp.float32),
            "miss_bpdf": jnp.full((N,), -1.0, jnp.float32),
            "bsdf_pdf": jnp.full((N,), -1.0, jnp.float32),
        }
        st = jax.lax.while_loop(cond, body, st)
        # deferred environment contribution (once per path), MIS-weighted
        env = env_miss_weighted(scene, settings, st["miss_dir"],
                                st["miss_bpdf"], cam_env_rotation)
        return st["rng"], st["accum"] + st["miss_mask"] * env

    return integrate
