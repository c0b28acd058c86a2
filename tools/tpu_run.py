"""Retry harness for TPU jobs behind the shared axon tunnel.

The tunnel relay intermittently wedges: backend init blocks forever, then
recovers minutes later with no local action (round-4 post-mortem:
BENCH_r04 probed null, a re-run hours later measured 146.78; this round:
probe fail / probe ok alternating within minutes). Every TPU measurement
this repo records therefore goes through this loop: probe until the chip
answers, run the real job bounded, retry the whole cycle on failure.

Usage: python tools/tpu_run.py [--timeout S] [--attempts N] -- cmd args...
Exit code: the job's rc on success, 1 if every attempt failed.
"""

import argparse
import subprocess
import sys
import time

_PROBE = (
    "import jax, jax.numpy as jnp;"
    "d = jax.devices();"
    "x = jnp.ones((128, 128));"
    "print(float((x @ x).sum()), d[0].device_kind)"
)


def probe(timeout_s=120):
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=1800.0,
                    help="per-attempt job timeout (s)")
    ap.add_argument("--attempts", type=int, default=4)
    ap.add_argument("--cooldown", type=float, default=90.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given")

    for attempt in range(1, args.attempts + 1):
        # Wait for the chip to answer before burning a job attempt.
        for _ in range(6):
            if probe():
                break
            print(f"[tpu_run] chip not answering; cooldown "
                  f"{args.cooldown:.0f}s", file=sys.stderr, flush=True)
            time.sleep(args.cooldown)
        else:
            print("[tpu_run] chip never answered the probe",
                  file=sys.stderr, flush=True)
            continue
        print(f"[tpu_run] attempt {attempt}: {' '.join(cmd)}",
              file=sys.stderr, flush=True)
        try:
            r = subprocess.run(cmd, timeout=args.timeout)
        except subprocess.TimeoutExpired:
            print(f"[tpu_run] attempt {attempt} timed out "
                  f"({args.timeout:.0f}s)", file=sys.stderr, flush=True)
            time.sleep(args.cooldown)
            continue
        if r.returncode == 0:
            return 0
        print(f"[tpu_run] attempt {attempt} rc={r.returncode}",
              file=sys.stderr, flush=True)
        time.sleep(args.cooldown)
    return 1


if __name__ == "__main__":
    sys.exit(main())
