#!/bin/bash
# Staged round-5 TPU measurement sweep. Each stage goes through the
# tpu_run.py probe-until-healthy harness so a transient tunnel wedge
# costs one stage, not the whole sweep (benchmarks.py merges per-config
# rows into benchmarks.json).
cd /root/repo
R=tools/tpu_run.py
log() { echo "[sweep $(date +%H:%M:%S)] $*"; }

log "stage 0: headline bench.py"
python $R --timeout 900 --attempts 6 --cooldown 120 -- python bench.py \
  | tee /tmp/bench_headline.json

log "stage 1: mesh_ball (the mesh bar, rowdyn candidate)"
python $R --timeout 3000 --attempts 4 --cooldown 120 -- \
  python benchmarks.py mesh_ball

log "stage 2: everything"
python $R --timeout 3000 --attempts 4 --cooldown 120 -- \
  python benchmarks.py everything

log "stage 3: interior (instanced 1024 + pbrt 1920x1080)"
python $R --timeout 4200 --attempts 4 --cooldown 120 -- \
  python benchmarks.py interior

log "stage 4: fourier_plastic"
python $R --timeout 2400 --attempts 4 --cooldown 120 -- \
  python benchmarks.py fourier

log "stage 5: remaining flat-geometry configs"
python $R --timeout 3600 --attempts 4 --cooldown 120 -- \
  python benchmarks.py cornell plates env_mapped mixed perlin

log "sweep complete"
