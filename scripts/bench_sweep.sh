#!/bin/bash
# Perf A/B sweep on the TPU — each bench run is 10-20 min wall, mostly
# remote compiles (see memory: axon tunnel compiles 2-8 min/program).
# Run the variants that matter before committing a CORR_IMPL default.
cd "$(dirname "$0")/.."
mkdir -p /tmp/sweep
run() { name=$1; shift; echo "=== $name ==="; timeout 2400 "$@" 2>&1 | tee /tmp/sweep/$name.log | tail -4; }
run base_device    python bench.py --device --phases
run pallas_g8      env DPVO_CORR_G=8 python bench.py --device
run pallas_sw      python bench.py --device --opts CORR_IMPL pallas_sw
run xla            python bench.py --device --opts CORR_IMPL xla
# global BA on-device proof at default capacities (VERDICT weak #6)
run loopclosure    python bench.py --opts LOOP_CLOSURE True
