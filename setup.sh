#!/bin/bash
# Editable install + config discovery (reference setup.sh symlinked the sres
# package into the script dirs; a pip editable install replaces that).
set -e
cd "$(dirname "$0")"
pip install -e . --no-deps
echo "sres_tpu installed (editable). Config tree: $(pwd)/config (override with SRES_CONFIG)."
