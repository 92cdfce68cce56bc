#!/usr/bin/env bash
# Launch analogue of the reference's run.sh / jobscript (PBS+mpirun):
# single-program SPMD — device parallelism comes from the JAX mesh,
# not process ranks.
set -euo pipefail
cd "$(dirname "$0")/.."

# golden-parity (host, float64):
python -m coulomb_gmg_tpu.cli examples/gaussian-charges.prm --cpu --cycles 6

# accelerator (float32, Chebyshev GMG):
# python -m coulomb_gmg_tpu.cli examples/gaussian-charges.prm
