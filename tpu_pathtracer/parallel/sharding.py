"""Multi-chip rendering: shard the wavefront over a device mesh.

The reference is single-GPU (`cudaSetDevice(0)`, src/main.cpp:723); path
tracing is embarrassingly parallel over pixels, so the TPU-native scale-out
is: replicate the scene, shard the lane axis (pixels) across chips via
shard_map over a 1-D mesh, render locally, and let the final image assembly
be a no-op gather of the sharded accumulation buffer. No per-bounce
communication exists because every path is independent (SURVEY.md §2.3).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


def make_mesh(devices=None, axis_name="lanes"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


class ShardedRenderer:
    """Wraps a Renderer to run each progressive frame sharded over a mesh.

    The accumulation buffer lives sharded on-device; `render_frame` has the
    same signature as Renderer's. Lane count is padded to a multiple of the
    mesh size.
    """

    def __init__(self, renderer, mesh: Mesh = None):
        from ..tracer.renderer import Renderer  # noqa: F401 (typing only)
        self.base = renderer
        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        n_dev = self.mesh.devices.size
        n = renderer.width * renderer.height
        self.n_lanes = ((n + n_dev - 1) // n_dev) * n_dev

        lane_sharding = NamedSharding(self.mesh, P(self.axis))
        repl = NamedSharding(self.mesh, P())
        self._lane_sharding = lane_sharding

        # place scene replicated once
        self.scene = {
            k: (jax.device_put(v, repl) if hasattr(v, "shape") else v)
            for k, v in renderer.scene.items()
        }

        # the Pallas packet kernel only runs on TPU devices; a CPU mesh
        # (e.g. the multi-chip dry run on virtual devices) must use the
        # pure-JAX traversal regardless of the process default backend
        import dataclasses
        from ..tracer.wavefront import make_integrator
        plats = {d.platform for d in np.asarray(self.mesh.devices).ravel()}
        integrate = None
        if plats != {"tpu"} and renderer.settings.traversal in ("auto",
                                                                "packet"):
            integrate = make_integrator(dataclasses.replace(
                renderer.settings, traversal="wavefront"))

        def frame_fn(scene, cam_vec, frame_hash, accum):
            def local(scene, cam_vec, frame_hash, accum_chunk):
                idx = jax.lax.axis_index(self.axis)
                chunk = accum_chunk.shape[0]
                lane0 = (idx * chunk).astype(jnp.uint32)
                return renderer._render_chunk(
                    scene, cam_vec, frame_hash, lane0, accum_chunk,
                    integrate=integrate)

            # check_vma=False: the integrator's while_loop carries start from
            # broadcast constants (unvarying) and become lane-varying after
            # one iteration, which the varying-manual-axes checker rejects;
            # the computation itself is trivially per-lane correct.
            return jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(), P(), P(), P(self.axis)),
                out_specs=P(self.axis), check_vma=False)(
                    scene, cam_vec, frame_hash, accum)

        self._frame_fn = jax.jit(frame_fn)

    def zeros_accum(self):
        return jax.device_put(
            jnp.zeros((self.n_lanes, 3), jnp.float32), self._lane_sharding)

    def render_frame(self, accum, camera, frame_number: int):
        from ..core.rng import wang_hash
        cam_vec = jnp.asarray(camera.as_array())
        fh = wang_hash(jnp.uint32(frame_number))
        return self._frame_fn(self.scene, cam_vec, fh, accum)

    def accum_to_image(self, accum, frame_count):
        return self.base.accum_to_image(accum, frame_count)

    def accum_to_buffer(self, accum):
        return self.base.accum_to_buffer(accum)
