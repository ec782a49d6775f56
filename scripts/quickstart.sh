#!/bin/bash
set -e
echo "Running Parkinson's Multimodal Fusion Quickstart (Synthetic, TPU)..."
export PYTHONPATH=$PYTHONPATH:$(pwd)/src
python3 -m pd_fusion.cli run --config configs/quickstart.yaml --synthetic
echo "Quickstart complete. Check the 'runs/' directory for outputs."
