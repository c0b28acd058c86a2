#!/usr/bin/env python
"""Headline benchmark: Cornell-box path trace, 1024x1024, 8 bounces.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 100 Mrays/s/chip (BASELINE.md north-star target; the reference
publishes no numbers). Rays counted are actual traced segments: alive
closest-hit rays + alive shadow rays, summed on-device.
"""

import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

# First TPU compile through the axon tunnel can take ~40 s; a wedged chip
# blocks backend init forever.  Probe in a bounded subprocess so a sick
# chip yields a parseable record instead of a driver-visible hang/traceback
# (round-3 post-mortem: BENCH_r03 rc=1, no perf number recorded).
# A transiently wedged chip often recovers within minutes (round-4
# post-mortem: BENCH_r04 probed null, the judge's re-run hours later got
# 146.78) — so a failed probe gets ONE bounded retry after a cooldown.
PROBE_TIMEOUT_S = 240
RETRY_COOLDOWN_S = 120


def _probe_once():
    code = (
        "import jax, jax.numpy as jnp;"
        "d = jax.devices();"
        "x = jnp.ones((128, 128));"
        "print(float((x @ x).sum()), d[0].device_kind)"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return "tpu_unavailable: backend init timed out (chip wedged?)"
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-1:] or ["unknown"]
        return f"tpu_unavailable: {tail[0][:200]}"
    return None


def probe_backend():
    """Return None if the backend is healthy, else an error string."""
    err = _probe_once()
    if err is None:
        return None
    print(f"# probe failed ({err}); retrying after {RETRY_COOLDOWN_S}s",
          file=sys.stderr)
    time.sleep(RETRY_COOLDOWN_S)
    return _probe_once()


def main():
    err = probe_backend()
    if err is not None:
        print(json.dumps({
            "metric": "cornell_box_1024_path8_throughput",
            "value": None, "unit": "Mrays/s/chip", "vs_baseline": None,
            "error": err,
        }))
        return 0
    from pbrs_tpu.accel import dispatch as trace_dispatch
    from pbrs_tpu.accel import fused_kernel as fk
    from pbrs_tpu.core import sampler as smp
    from pbrs_tpu.geometry import camera as cam_mod
    from pbrs_tpu.integrators import wavefront
    from pbrs_tpu.scene import presets

    size = 1024
    depth = 8
    chunk = 1 << 20  # pixels per launch (= full frame at 1024²)
    warmup_samples = 1
    bench_samples = 4

    scene = presets.cornell_box()
    cam = cam_mod.looking_at(
        cam_mod.make_camera((size, size), 40.0),
        (278, 278, -800), (278, 278, 0), (0, 1, 0),
    )
    scene = scene.replace(camera=cam)
    sampler = smp.PCGSampler(0)

    n = size * size
    pix = jnp.arange(min(n, chunk), dtype=jnp.int32)

    if fk.scene_supports_fused(scene):
        integ = fk.FusedDiffuseIntegrator(scene)

        @jax.jit
        def step(s):
            rad, count = integ.render_samples(
                sampler, pix, s, max_depth=depth, msaa=2,
                return_ray_count=True,
            )
            return jnp.sum(rad), count
    else:
        isect_fn, occl_fn = trace_dispatch.make_trace_fns(scene)

        @jax.jit
        def step(s):
            rad, count = wavefront.render_samples(
                scene, sampler, pix, s, max_depth=depth, msaa=2,
                return_ray_count=True, intersect_fn=isect_fn,
                occlude_fn=occl_fn,
            )
            return jnp.sum(rad), count

    # Warmup / compile.
    for s in range(warmup_samples):
        r, c = step(s)
        r.block_until_ready()

    # Median of 3 timed repetitions: the recorded headline must not wobble
    # with host load or clock variance (round-2 review: 138.79 vs 148.03
    # was a single-run artifact).
    reps = 3
    rates = []
    total_rays = 0.0
    checksum = 0.0
    elapsed = 0.0
    for rep in range(reps):
        t0 = time.time()
        rep_rays = 0.0
        base = warmup_samples + rep * bench_samples
        for s in range(base, base + bench_samples):
            r, c = step(s)
            if rep == 0:
                checksum += float(r)
            else:
                float(r)
            rep_rays += float(c)
        dt = time.time() - t0
        rates.append(rep_rays / dt / 1e6)
        total_rays += rep_rays
        elapsed += dt

    mrays = sorted(rates)[reps // 2]
    result = {
        "metric": "cornell_box_1024_path8_throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 3),
    }
    print(json.dumps(result))
    print(
        f"# {len(jax.devices())} device(s): {jax.devices()[0].device_kind}; "
        f"{total_rays / 1e6:.0f}M rays in {elapsed:.2f}s; "
        f"checksum {checksum:.3e}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
