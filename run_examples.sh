#!/usr/bin/env bash
# End-to-end pipeline smoke run (the reference's run_examples.sh analogue):
# ingest -> bin -> OI -> postprocess -> plots, all from JSON configs in
# configs/. Runs on CPU unless a TPU is attached.
set -euo pipefail
cd "$(dirname "$0")"

export PYTHONPATH="$(pwd):${PYTHONPATH:-}"
WORK=$(mktemp -d)
echo "work dir: $WORK"

python examples/make_example_configs.py "$WORK"

python -m gpsat_tpu.read_and_store "$WORK/read_and_store.json"
python -m gpsat_tpu.bin_data "$WORK/bin_data.json"
python -m gpsat_tpu.local_expert_oi "$WORK/local_expert_oi.json"
python -m gpsat_tpu.postprocessing "$WORK/postprocessing.json"
python examples/plot_from_results.py "$WORK/results.h5" "" "$WORK/results.png"

echo "pipeline complete; outputs in $WORK"
