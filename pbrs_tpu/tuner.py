"""Pilot-measured render configuration selection.

Rounds 2-3 selected the render configuration by static eligibility: the
first fused integrator whose kernel *supports* the scene won, and the
round-3 fast paths (row-dense treelet mode, the compaction schedule) were
env-var opt-ins that nothing enabled. That shipped a 2.6x slowdown on the
interior (fused_wave eligible != fused_wave faster) and left the mesh
configs running the slow defaults (round-3 VERDICT #3/#5).

This module picks by MEASUREMENT: build each candidate configuration
(integrator x trace mode x compaction), time one real launch at the
render's own shapes, keep the winner. Candidates:

* integrator: the statically-specialized fused kernels where supported
  (diffuse / single-lobe are unconditional wins, measured every round
  since r1 — not re-measured), otherwise fused_wave AND the general
  wavefront, both timed (the contested pair).
* trace mode: per-lane one-hot vs row-dense treelet kernels, when any
  treelet tracer can run row-dense.
* compaction: masked loop vs the auto_schedule shrink loop (only
  meaningful when the pilot's alive counts actually shrink).

The pilot costs a few compiles (cached across samples/repeats); for any
render long enough to care about throughput it amortizes to noise.
Explicit `trace_mode=`/`compact=` arguments (or the PBRS_TRACE_MODE /
PBRS_COMPACT env vars, kept for profiling) bypass measurement.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .accel import dispatch as trace_dispatch
from .integrators import wavefront

# Bump when kernel families / candidate semantics change: stale cached
# winners must not outlive the kernels they were measured against.
TUNER_CACHE_VERSION = 1
_CACHE_DIR_ENV = "PBRS_TUNER_CACHE"


def _scene_fingerprint(scene):
    """Cheap, stable identity for tuning decisions: family/material/light
    shapes + world-extent content sample. Two scenes with the same
    fingerprint have the same kernel-eligibility and (to the pilot's
    resolution) the same cost structure."""
    g = scene.geom

    def cnt(a):
        return int(np.asarray(a).shape[0])

    parts = [cnt(g.tri_p0), cnt(g.quad_origin), cnt(g.sph_center),
             cnt(g.disk_center), int(scene.num_lights)]
    try:
        mk = np.asarray(scene.materials.kind)
        parts.append(list(mk.shape))
        parts.append([int(x) for x in mk.reshape(-1)])
    except Exception:
        pass
    env = getattr(scene, "env", None)
    parts.append(getattr(env, "kind", None) if env is not None else None)
    for grp in getattr(scene, "instanced", ()):
        gg = grp.geom
        parts.append(("grp", cnt(gg.tri_p0), cnt(gg.quad_origin),
                      cnt(gg.sph_center), cnt(gg.disk_center),
                      int(np.asarray(grp.fwd).shape[0])))
    # Content sample: geometry extents (rounded) catch same-shape scenes
    # with different layouts without hashing full buffers.
    for a in (g.tri_p0, g.quad_origin, g.sph_center, g.disk_center):
        arr = np.asarray(a)
        if arr.size:
            parts.append([round(float(x), 3)
                          for x in (arr.min(0).tolist()
                                    + arr.max(0).tolist())])
    blob = json.dumps(parts, sort_keys=True).encode()
    return hashlib.sha1(blob).hexdigest()[:16]


def _cache_path(key):
    root = os.environ.get(_CACHE_DIR_ENV) or ".pbrs_tuner"
    return os.path.join(root, f"{key}.json")


def _cache_key(scene, n_lanes, depth, msaa, trace_mode, compact):
    dev = jax.devices()[0].device_kind if jax.devices() else "none"
    blob = json.dumps([TUNER_CACHE_VERSION, _scene_fingerprint(scene),
                       int(n_lanes), int(depth), int(msaa),
                       str(trace_mode), str(compact), dev]).encode()
    return hashlib.sha1(blob).hexdigest()[:24]


def _cache_load(key):
    try:
        with open(_cache_path(key)) as f:
            return json.load(f)
    except Exception:
        return None


def _cache_store(key, rec):
    try:
        root = os.environ.get(_CACHE_DIR_ENV) or ".pbrs_tuner"
        os.makedirs(root, exist_ok=True)
        tmp = _cache_path(key) + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, _cache_path(key))
    except Exception:
        pass  # caching is best-effort; never fail a render over it


def _env_overrides():
    tm = os.environ.get("PBRS_TRACE_MODE") or None
    comp = os.environ.get("PBRS_COMPACT")
    compact = None if comp is None else comp == "1"
    return tm, compact


def _scene_treelet_scale(scene):
    """True when any primitive family is large enough to be treelet-traced
    (the scale where trace-mode / resort candidates can matter)."""
    try:
        from .accel import trace_pallas as tp

        geom = scene.geom
        groups = getattr(scene, "instanced", ())
        counts = [int(np.asarray(geom.tri_p0).shape[0]),
                  int(np.asarray(geom.quad_origin).shape[0]),
                  int(np.asarray(geom.sph_center).shape[0]),
                  int(np.asarray(geom.disk_center).shape[0])]
        big = any(c > tp.TREELET_THRESHOLD for c in counts)
        for g in groups:
            gg = g.geom
            big = big or any(
                int(np.asarray(a).shape[0]) > tp.TREELET_THRESHOLD
                for a in (gg.tri_p0, gg.quad_origin, gg.sph_center,
                          gg.disk_center))
        return big
    except Exception:
        return False


def _treelet_modes(scene):
    """Trace-mode candidates for this scene's tracers."""
    if jax.default_backend() in ("cpu",):
        return [None]
    if _scene_treelet_scale(scene):
        # rowdyn falls back to rowdense per-tracer when its VMEM-gated
        # table is unavailable, so it is always safe to measure.
        return [None, "rowdense", "rowdyn"]
    return [None]


class TunedRender:
    """One render configuration: integrator (or general path) + trace fns
    + optional shrink schedule, callable as (lanes, sample_ids) ->
    (radiance [N,3], traced_segment_count)."""

    def __init__(self, scene, sampler, depth, msaa, trace_mode, integ,
                 schedule, isect_fn, occl_fn, label, nee_mode="twoarm",
                 resort=False):
        self.scene = scene
        self.sampler = sampler
        self.depth = depth
        self.msaa = msaa
        self.trace_mode = trace_mode
        self.integ = integ
        self.schedule = schedule
        self.isect_fn = isect_fn
        self.occl_fn = occl_fn
        self.label = label
        self.nee_mode = nee_mode
        self.resort = resort

    def masked(self):
        """Twin configuration without the shrink schedule — for odd-sized
        tail batches whose lane count doesn't match the schedule."""
        if self.schedule is None:
            return self
        return TunedRender(
            self.scene, self.sampler, self.depth, self.msaa,
            self.trace_mode, self.integ, None, self.isect_fn,
            self.occl_fn, self.label + "/masked-tail", self.nee_mode)

    def __call__(self, lanes, sample_ids):
        if self.integ is not None:
            if self.schedule is not None:
                return self.integ.render_samples_compacted(
                    self.sampler, lanes, sample_ids, self.schedule,
                    max_depth=self.depth, msaa=self.msaa,
                    return_ray_count=True, resort=self.resort)
            return self.integ.render_samples(
                self.sampler, lanes, sample_ids, max_depth=self.depth,
                msaa=self.msaa, return_ray_count=True)
        return wavefront.render_samples(
            self.scene, self.sampler, lanes, sample_ids,
            max_depth=self.depth, msaa=self.msaa,
            intersect_fn=self.isect_fn, occlude_fn=self.occl_fn,
            return_ray_count=True, shrink_schedule=self.schedule,
            nee_mode=self.nee_mode, resort=self.resort)


def _measure(step, lanes, sample_ids, reps=2):
    """Compile + time `reps` launches; returns median seconds/launch.
    Raises if the candidate's radiance is non-finite — a fast wrong
    candidate must never win the tuning race."""
    fn = jax.jit(step)
    out = fn(lanes, sample_ids)
    jax.block_until_ready(out)
    rad = out[0] if isinstance(out, tuple) else out
    if not bool(jnp.isfinite(rad).all()):
        raise FloatingPointError("non-finite radiance from candidate")
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(lanes, sample_ids))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _auto_sched(scene, sampler, lanes, sample_ids, depth, msaa, isect_fn,
                folded=False):
    counts = np.asarray(jax.jit(
        lambda: wavefront.measure_alive(
            scene, sampler, lanes, sample_ids, max_depth=depth, msaa=msaa,
            intersect_fn=isect_fn))())
    if folded:
        # Folded NEE: a lane that dies at bounce b-1 still owes its
        # pending MIS-arm resolution at bounce b, and its block must keep
        # capacity (block_compact keeps need = alive | pend_valid). Pend
        # lanes at b were alive during b-1's shade, so lagging the covered
        # counts by one bounce is an exact bound — the roulette keep
        # probability stays 1 and the folded compacted estimator matches
        # the folded masked one (tests/test_fused_wave.py).
        counts = np.maximum(counts, np.concatenate([counts[:1],
                                                    counts[:-1]]))
    n = int(lanes.shape[0])
    sched = wavefront.auto_schedule(counts, n)
    if all(c >= n for c in sched):
        return None  # nothing ever shrinks; the masked loop is the same
    return sched


def tune(scene, sampler, lanes, sample_ids, depth=5, msaa=2,
         trace_mode="auto", compact="auto", verbose=False):
    """Measure candidate configurations on (lanes, sample_ids)-shaped
    batches and return the fastest TunedRender.

    trace_mode: 'auto' | None | 'onehot' | 'rowdense'
    compact: 'auto' | True | False
    """
    env_tm, env_compact = _env_overrides()
    if env_tm is not None:
        trace_mode = env_tm
    if env_compact is not None:
        compact = env_compact

    from .accel import fused_kernel as fk
    from .accel import fused_single_lobe as fsl
    from .accel import fused_wave as fw

    def log(msg):
        if verbose:
            import sys

            print(f"  [tune] {msg}", file=sys.stderr, flush=True)

    def rebuild(rec):
        """TunedRender from a cached winner record (no measurement)."""
        mode = rec["mode"]
        isect_fn, occl_fn = trace_dispatch.make_trace_fns(
            scene, trace_mode=mode)
        iname = rec["integ"]
        if iname == "general":
            integ = None
        elif iname == "wave":
            integ = fw.FusedWaveIntegrator(
                scene, trace_mode=mode, folded=rec["nee_mode"] == "folded")
        else:
            return None
        sched = rec["schedule"]
        return TunedRender(
            scene, sampler, depth, msaa, mode, integ,
            tuple(sched) if sched is not None else None,
            isect_fn, occl_fn, rec["label"], nee_mode=rec["nee_mode"],
            resort=bool(rec.get("resort", False)))

    def serialize(cand):
        return {
            "label": cand.label,
            "mode": cand.trace_mode,
            "integ": "general" if cand.integ is None else "wave",
            "nee_mode": cand.nee_mode,
            "schedule": (list(cand.schedule)
                         if cand.schedule is not None else None),
            "resort": bool(cand.resort),
        }

    cache_key = None
    # Per-candidate measurements checkpointed as they land, so a pilot
    # killed mid-run (job timeout, wedged chip) RESUMES instead of
    # restarting — the full candidate set can exceed one healthy-chip
    # window on flaky tunnels (round-5 post-mortem: two 3000 s mesh_ball
    # attempts died inside the pilot loop).
    partial = {}
    if os.environ.get("PBRS_TUNER_NOCACHE") != "1":
        try:
            cache_key = _cache_key(scene, lanes.shape[0], depth, msaa,
                                   trace_mode, compact)
            rec = _cache_load(cache_key)
            if rec is not None and "partial" in rec:
                partial = dict(rec["partial"])
                log(f"resuming pilot: {len(partial)} cached measurements")
            elif rec is not None:
                cand = rebuild(rec)
                if cand is not None:
                    log(f"cache hit ({cache_key}): {cand.label}")
                    return cand
        except Exception as e:
            log(f"cache lookup failed ({type(e).__name__}: {e})")
            cache_key = None

    modes = ([trace_mode] if trace_mode != "auto"
             else _treelet_modes(scene))
    compacts = [compact] if compact != "auto" else [False, True]

    # Statically-specialized kernels: unconditional winners when eligible
    # (diffuse: 160 vs ~60 Mrays/s unfused on cornell; single-lobe: 2.9-7x
    # on plates/env_mapped — measured rounds 1-3 and re-verified r4).
    if fk.scene_supports_fused(scene):
        isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene)
        return TunedRender(scene, sampler, depth, msaa, None,
                           fk.FusedDiffuseIntegrator(scene), None,
                           isect_fn, occl_fn, "fused_diffuse")
    if fsl.scene_supports_single_lobe(scene):
        isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene)
        return TunedRender(scene, sampler, depth, msaa, None,
                           fsl.FusedSingleLobeIntegrator(scene), None,
                           isect_fn, occl_fn, "fused_single_lobe")

    candidates = []
    wave_ok = fw.scene_supports_wave(scene)
    for mode in modes:
        isect_fn, occl_fn = trace_dispatch.make_trace_fns(
            scene, trace_mode=mode)
        sched = sched_folded = None
        if any(compacts):
            try:
                sched = _auto_sched(scene, sampler, lanes, sample_ids,
                                    depth, msaa, isect_fn)
                sched_folded = _auto_sched(scene, sampler, lanes,
                                           sample_ids, depth, msaa,
                                           isect_fn, folded=True)
            except Exception as e:  # a broken mode must not kill the tune
                log(f"{mode or 'onehot'}: pilot failed "
                    f"({type(e).__name__}: {e})")
                sched = sched_folded = None
            if sched is None:
                log(f"{mode or 'onehot'}: schedule never shrinks; "
                    "compaction candidates skipped")
        mname = mode or "onehot"
        # The general path is measured in both NEE structures: "twoarm"
        # (a dedicated occlusion ray for the BSDF-sampled MIS arm, the
        # reference's shape) and "folded" (the path's continuation ray IS
        # that arm's visibility query — one shadow batch per bounce,
        # identical expectation; tests/test_folded_nee.py). The wave
        # megakernel gets the same pair.
        integs = [(None, "general", "twoarm"), (None, "general-folded",
                                                "folded")]
        if scene.num_lights == 0:
            integs = integs[:1]  # folded == twoarm with no lights
        if wave_ok:
            integs.append(
                (fw.FusedWaveIntegrator(scene, trace_mode=mode), "wave",
                 "twoarm"))
            if scene.num_lights > 0 and fw.scene_supports_wave_folded(
                    scene):
                integs.append(
                    (fw.FusedWaveIntegrator(scene, trace_mode=mode,
                                            folded=True),
                     "wave-folded", "folded"))
        seen = set()
        # Resort candidates only pay off on treelet-scale geometry (the
        # row-cost tracers); gate on the scene's actual size, not on the
        # caller having pinned a trace mode (ADVICE r4).
        big = _scene_treelet_scale(scene)
        for integ, iname, nmode in integs:
            for comp in compacts:
                s = (sched_folded if nmode == "folded" else sched) \
                    if comp else None
                label = f"{iname}/{mname}{'/compact' if s else ''}"
                if label in seen:
                    continue  # compact=True with no shrink == masked
                seen.add(label)
                candidates.append(TunedRender(
                    scene, sampler, depth, msaa, mode, integ, s,
                    isect_fn, occl_fn, label, nee_mode=nmode))
            # Sort-only resort (ARCHITECTURE §11): even when nothing
            # shrinks, permuting bounce>=1 batches into (origin-morton,
            # direction-octant) block order re-couples the row-cost
            # tracers. Only worth measuring on treelet-traced scenes,
            # and only for the stronger NEE structure.
            if big and (nmode == "folded" or scene.num_lights == 0):
                s = (sched_folded if nmode == "folded" else sched)
                rlabel = (f"{iname}/{mname}"
                          f"{'/compact' if s else ''}/resort")
                if rlabel not in seen:
                    seen.add(rlabel)
                    n = int(lanes.shape[0])
                    candidates.append(TunedRender(
                        scene, sampler, depth, msaa, mode, integ,
                        s if s is not None else (n,) * depth,
                        isect_fn, occl_fn, rlabel, nee_mode=nmode,
                        resort=True))

    if len(candidates) == 1:
        return candidates[0]

    best, best_t = None, float("inf")
    for cand in candidates:
        if cand.label in partial:
            dt = partial[cand.label]
            if dt is None:  # failed in a previous attempt; don't retry
                continue
            log(f"{cand.label}: {dt * 1e3:.1f} ms/launch (checkpointed)")
        else:
            try:
                dt = _measure(cand, lanes, sample_ids)
            except Exception as e:  # a failing candidate must not kill renders
                log(f"{cand.label}: failed ({type(e).__name__}: {e})")
                partial[cand.label] = None
                if cache_key is not None:
                    _cache_store(cache_key, {"partial": partial})
                continue
            log(f"{cand.label}: {dt * 1e3:.1f} ms/launch")
            partial[cand.label] = dt
            if cache_key is not None:
                _cache_store(cache_key, {"partial": partial})
        if dt < best_t:
            best, best_t = cand, dt
    if best is None:
        # Every candidate failed (should not happen): masked general path.
        isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene)
        best = TunedRender(scene, sampler, depth, msaa, None, None, None,
                           isect_fn, occl_fn, "general/fallback")
    elif cache_key is not None:
        _cache_store(cache_key, serialize(best))
    log(f"selected {best.label}")
    return best
