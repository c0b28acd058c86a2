"""Render driver: film accumulation, sample batching, checkpoint/resume.

The train-loop equivalent of reference src/main.rs:190-245, re-shaped for
device execution: instead of a rayon fan-out over rows, the whole pixel
grid renders one sample batch per device launch, accumulating into a film
buffer. Film + sample count is the complete renderer state, so
checkpointing is trivial (the reference has none, SURVEY §5).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .accel import dispatch as trace_dispatch
from .core import sampler as smp
from .integrators import direct as direct_mod
from .integrators import wavefront


@dataclass
class RenderStats:
    wall_time: float = 0.0
    camera_rays: int = 0
    spp: int = 0
    launches: int = 0
    # Estimated total rays traced (camera + bounce + shadow), filled by the
    # driver from depth / NEE configuration.
    traced_rays: int = 0
    # --debug_checks: {invariant: violation count} (see debug_audit.py).
    audit: dict | None = None


@dataclass
class Film:
    """Accumulated radiance + sample count; the full checkpointable state."""

    width: int
    height: int
    accum: np.ndarray = field(default=None)
    samples_done: int = 0

    def __post_init__(self):
        if self.accum is None:
            self.accum = np.zeros((self.height * self.width, 3), np.float32)

    def mean_image(self) -> np.ndarray:
        n = max(self.samples_done, 1)
        return (self.accum / n).reshape(self.height, self.width, 3)

    def save(self, path: str) -> None:
        np.savez(path, accum=self.accum, samples_done=self.samples_done,
                 width=self.width, height=self.height)

    @staticmethod
    def load(path: str) -> "Film":
        z = np.load(path)
        return Film(
            width=int(z["width"]), height=int(z["height"]),
            accum=z["accum"], samples_done=int(z["samples_done"]),
        )



def _measured_schedule(scene, sampler, w, h, chunk, spp_total, max_depth,
                       msaa, isect_fn):
    """Pilot-measure per-bounce covered-lane counts at the REAL launch
    lane count (chunk pixels x samples_per_launch) and derive a static
    shrink schedule (wavefront.auto_schedule)."""
    n = w * h
    samples_per_launch = max(1, min(spp_total, chunk // max(n, 1)))
    order = wavefront.morton_pixel_order(w, h)
    pix0 = np.tile(order[:min(n, chunk)], samples_per_launch)
    sid0 = np.repeat(np.arange(samples_per_launch, dtype=np.int32),
                     min(n, chunk))
    counts = np.asarray(jax.jit(lambda: wavefront.measure_alive(
        scene, sampler, jnp.asarray(pix0), jnp.asarray(sid0),
        max_depth=max_depth, msaa=msaa, intersect_fn=isect_fn))())
    return wavefront.auto_schedule(counts, pix0.shape[0])


def render_image(scene, spp: int = 4, max_depth: int = 5, integrator: str = "path",
                 seed: int = 0, chunk_pixels: int | None = None,
                 progress: bool = False, film: Film | None = None,
                 checkpoint_path: str | None = None,
                 checkpoint_every: int = 0, use_nee: bool = True,
                 use_pallas: bool | None = None,
                 pixel_filter: tuple | None = None,
                 profile_dir: str | None = None,
                 sampler_kind: str = "pcg",
                 trace_mode: str | None = "auto",
                 compact: bool | str = "auto",
                 debug_checks: bool = False):
    """Render the scene camera view. Returns (image [H,W,3], RenderStats).

    spp is rounded up to a square (msaa² stratification, matching the
    reference's msaa semantics, reference src/main.rs:197-203).

    trace_mode: treelet kernel selection ('rowdense' for the row-shared
    dense visits — pairs with the Morton lane order this driver always
    uses; None for the per-lane one-hot kernels). compact: shrink the
    bounce wavefront with a measured per-depth schedule + spatial
    block re-sort (estimator-identical; see wavefront.block_compact).

    'auto' (default, TPU path renders): pick integrator, trace mode and
    compaction by timing one launch of each candidate (pbrs_tpu.tuner) —
    eligibility-based selection shipped a 2.6x interior regression in
    round 3. Explicit values pin the choice.
    """
    cam = scene.camera
    w, h = cam.width, cam.height
    n = w * h
    msaa = max(1, int(np.ceil(np.sqrt(spp))))
    spp_total = msaa * msaa
    if film is None:
        film = Film(width=w, height=h)
    samplers = {"pcg": smp.PCGSampler, "sobol": smp.SobolSampler,
                "threefry": smp.ThreefrySampler}
    sampler = samplers[sampler_kind](seed)

    chunk = min(n, chunk_pixels or (1 << 20))
    n_chunks = (n + chunk - 1) // chunk
    pad_n = n_chunks * chunk

    on_device = use_pallas or (
        use_pallas is None and jax.default_backend() != "cpu")
    if debug_checks and integrator != "path":
        raise ValueError("--debug_checks audits the path integrator only")
    use_tuner = (
        (trace_mode == "auto" or compact == "auto")
        and integrator == "path" and use_nee and pixel_filter is None
        and sampler_kind in ("pcg", "sobol") and on_device
        and not debug_checks
    )
    if trace_mode == "auto":
        trace_mode = None
    if compact == "auto":
        compact = False

    isect_fn, occl_fn = trace_dispatch.make_trace_fns(
        scene, use_pallas, trace_mode=trace_mode)

    use_fused = False
    use_fused_sl = False
    use_fused_wave = False
    # Fused megakernels reproduce the PCG and Owen-scrambled-Sobol streams
    # in-kernel (fused_kernel._u1); threefry routes through the general
    # wavefront.
    if integrator == "path" and use_nee and pixel_filter is None and (
        sampler_kind in ("pcg", "sobol")
    ) and on_device and not use_tuner and not debug_checks:
        from .accel import fused_kernel as fk
        from .accel import fused_single_lobe as fsl
        from .accel import fused_wave as fw

        use_fused = fk.scene_supports_fused(scene)
        if not use_fused:
            use_fused_sl = fsl.scene_supports_single_lobe(scene)
        if not (use_fused or use_fused_sl):
            use_fused_wave = fw.scene_supports_wave(scene)

    filter_inv = None
    if pixel_filter is not None:
        from .core import filters as flt

        kind, radius = pixel_filter
        kinds = {"box": flt.BOX, "triangle": flt.TRIANGLE,
                 "gaussian": flt.GAUSSIAN, "mitchell": flt.MITCHELL,
                 "sinc": flt.LANCZOS, "lanczos": flt.LANCZOS}
        filter_inv = flt.make_filter_cdf(kinds[kind], float(radius))

    if integrator == "path" and use_tuner:
        from . import tuner as tuner_mod

        batch0 = max(1, min(spp_total, chunk // max(n, 1)))
        order0 = wavefront.morton_pixel_order(w, h)
        pix_pad = (np.concatenate([order0, order0[:pad_n - n]])
                   if pad_n > n else order0)
        pilot_pix = np.tile(pix_pad[:chunk], batch0)
        pilot_sid = np.repeat(np.arange(batch0, dtype=np.int32),
                              min(n, chunk))
        tuned = tuner_mod.tune(
            scene, sampler, jnp.asarray(pilot_pix), jnp.asarray(pilot_sid),
            depth=max_depth, msaa=msaa)
        tuned_masked = tuned.masked()
        pilot_n = int(pilot_pix.shape[0])

        def kernel(scene_, sampler_, pix, s, **_kw):
            t = tuned if int(pix.shape[0]) == pilot_n else tuned_masked
            rad, _count = t(pix, s)
            return rad
    elif integrator == "path" and (
            use_fused or use_fused_sl or use_fused_wave):
        if use_fused:
            from .accel import fused_kernel as fk

            fused = fk.FusedDiffuseIntegrator(scene)
        elif use_fused_sl:
            from .accel import fused_single_lobe as fsl

            fused = fsl.FusedSingleLobeIntegrator(scene)
        else:
            from .accel import fused_wave as fw

            fused = fw.FusedWaveIntegrator(scene, use_pallas=use_pallas,
                                           trace_mode=trace_mode)

        wave_sched = None
        if compact and isinstance(fused, fw.FusedWaveIntegrator) \
                and max_depth > 1:
            wave_sched = _measured_schedule(
                scene, sampler, w, h, chunk, spp_total, max_depth, msaa,
                isect_fn)

        def kernel(scene_, sampler_, pix, s, **_kw):
            if wave_sched is not None and pix.shape[0] == wave_sched[0]:
                return fused.render_samples_compacted(
                    sampler_, pix, s, wave_sched, max_depth=max_depth,
                    msaa=msaa)
            return fused.render_samples(sampler_, pix, s,
                                        max_depth=max_depth, msaa=msaa)
    elif integrator == "path":
        gen_sched = None
        if compact and max_depth > 1:
            gen_sched = _measured_schedule(
                scene, sampler, w, h, chunk, spp_total, max_depth, msaa,
                isect_fn)

        def kernel(scene_, sampler_, pix, s, **_kw):
            sched = gen_sched
            if sched is not None and pix.shape[0] != sched[0]:
                sched = None  # odd-sized tail chunk: masked loop
            return wavefront.render_samples(
                scene_, sampler_, pix, s, max_depth=max_depth, msaa=msaa,
                use_nee=use_nee, intersect_fn=isect_fn,
                occlude_fn=occl_fn, filter_inv_cdf=filter_inv,
                shrink_schedule=sched, audit=debug_checks)
    elif integrator == "direct":
        def kernel(scene, sampler, pix, s, **_kw):
            rays = wavefront.camera_rays(scene, sampler, pix, s, msaa)
            return direct_mod.direct_radiance(scene, rays, sampler, pix, s,
                                              depth=max_depth,
                                              intersect_fn=isect_fn,
                                              occlude_fn=occl_fn)
    elif integrator == "normals":
        def kernel(scene, sampler, pix, s, **_kw):
            rays = wavefront.camera_rays(scene, sampler, pix, s, msaa)
            return direct_mod.normal_visualizer(scene, rays)
    elif integrator == "materials":
        def kernel(scene, sampler, pix, s, **_kw):
            rays = wavefront.camera_rays(scene, sampler, pix, s, msaa)
            return direct_mod.material_visualizer(scene, rays)
    else:
        raise ValueError(f"unknown integrator {integrator!r}")

    def _step(sc, pix, s_base, batch):
        if batch > 1:
            lanes = jnp.tile(pix, batch)
            sid = jnp.repeat(
                s_base + jnp.arange(batch), pix.shape[0]
            ).astype(jnp.int32)
            out = kernel(sc, sampler, lanes, sid)
            if debug_checks:
                rad, aud = out
                return rad.reshape(batch, pix.shape[0], 3).sum(axis=0), aud
            return out.reshape(batch, pix.shape[0], 3).sum(axis=0)
        return kernel(sc, sampler, pix, s_base)

    jitted = jax.jit(_step, static_argnames=("batch",))

    stats = RenderStats(spp=spp_total)
    # Morton (Z-curve) lane order: estimator-neutral, but keeps each trace
    # row's pixels in a compact tile so the treelet tracers' row-shared
    # work stays small (see wavefront.morton_pixel_order).
    order = wavefront.morton_pixel_order(w, h)
    pixel_all = np.concatenate([order, order[:pad_n - n]]) \
        if pad_n > n else order
    # Pack multiple samples into one launch when the frame is small: the
    # chip wants ~1M lanes in flight.
    samples_per_launch = max(1, min(spp_total, chunk // max(n, 1)))
    t0 = time.time()
    s = film.samples_done
    # Per-chunk device-resident film accumulators: radiance stays on-device
    # until checkpoint/finish (host transfers dominate otherwise).
    dev_accum = [None] * n_chunks
    audit_total = None

    def flush_device_film():
        for c, acc in enumerate(dev_accum):
            if acc is None:
                continue
            nv = min(chunk, n - c * chunk)  # pad lanes (dup ids) dropped
            ids = pixel_all[c * chunk:c * chunk + nv]
            film.accum[ids] += np.asarray(acc)[:nv]
            dev_accum[c] = None

    pix_dev = [
        jnp.asarray(pixel_all[c * chunk:(c + 1) * chunk])
        for c in range(n_chunks)
    ]

    # Failure handling: SIGTERM/SIGINT mid-render flushes completed samples
    # to the checkpoint before exiting, so a preempted job resumes exactly
    # where it stopped (the film is the full renderer state).
    import signal

    prev_term = None
    stop = {"requested": False}

    def _on_term(signum, frame):
        stop["requested"] = True

    if checkpoint_path:
        try:
            prev_term = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:
            prev_term = None  # not the main thread

    from .profiling import profiler_trace

    import contextlib

    prof_stack = contextlib.ExitStack()
    prof_stack.enter_context(profiler_trace(profile_dir))
    try:
        while s < spp_total:
            batch = min(samples_per_launch, spp_total - s)
            # Stage the batch, then commit atomically: an interrupt mid-batch
            # leaves (accum, samples_done) consistent.
            staged = [jitted(scene, pix_dev[c], s, batch=batch)
                      for c in range(n_chunks)]
            for c, rad in enumerate(staged):
                if debug_checks:
                    rad, aud = rad
                    audit_total = (aud if audit_total is None
                                   else audit_total + aud)
                dev_accum[c] = (
                    rad if dev_accum[c] is None else dev_accum[c] + rad
                )
                stats.launches += 1
            s += batch
            film.samples_done = s
            stats.camera_rays += n * batch
            if progress:
                print(f"  sample {s}/{spp_total}", flush=True)
            hit_interval = checkpoint_every and s % checkpoint_every < batch
            if checkpoint_path and (hit_interval or stop["requested"]):
                flush_device_film()
                film.save(checkpoint_path)
            if stop["requested"]:
                raise KeyboardInterrupt  # preemption: film checkpointed
    except KeyboardInterrupt:
        if checkpoint_path:
            flush_device_film()
            film.save(checkpoint_path)
        raise
    finally:
        prof_stack.close()
        if prev_term is not None:
            signal.signal(signal.SIGTERM, prev_term)
    flush_device_film()
    if debug_checks and audit_total is not None:
        from .integrators import debug_audit as aud_mod

        stats.audit = aud_mod.report(audit_total)
    stats.wall_time = time.time() - t0
    # Ray accounting: per camera ray per bounce: 1 closest-hit + up to 2
    # shadow batches when NEE is on.
    rays_per_sample = max_depth * (3 if (use_nee and scene.num_lights) else 1)
    stats.traced_rays = stats.camera_rays * rays_per_sample
    if checkpoint_path:
        film.save(checkpoint_path)
    return film.mean_image(), stats
