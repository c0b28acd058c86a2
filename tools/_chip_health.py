"""Chip-health preflight for the profiling scripts in this directory.

Importing this module probes the TPU backend in a BOUNDED subprocess and
aborts the importing script if the chip is wedged or unreachable — a
profiling run launched against a sick chip either hangs in backend init
(round-3 post-mortem: make_c_api_client blocks forever) or, worse, keeps
feeding work to a chip other sessions share. Import it as the FIRST
import, before jax touches any backend:

    import _chip_health  # noqa: F401  (aborts unless the chip is healthy)
"""

import subprocess
import sys

PROBE_TIMEOUT_S = 240

_CODE = (
    "import jax, jax.numpy as jnp;"
    "d = jax.devices();"
    "x = jnp.ones((128, 128));"
    "print(float((x @ x).sum()), d[0].device_kind)"
)


def probe(timeout_s: float = PROBE_TIMEOUT_S):
    """Return None if the TPU backend answers a tiny matmul, else an
    error string. Runs in a subprocess so a wedged backend init cannot
    hang the caller."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _CODE],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return "backend init timed out (chip wedged?)"
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-1:] or ["unknown"]
        return tail[0][:200]
    return None


_err = probe()
if _err is not None:
    sys.exit(f"[chip-health] TPU unavailable, refusing to profile: {_err}")
print("[chip-health] chip answered the preflight probe", file=sys.stderr)
