#!/usr/bin/env bash
# Run validate_panel.py over every built-in panel.
set -euo pipefail
cd "$(dirname "$0")/.."
for panel in sharkmer_tpu/panels/*.yaml; do
    echo "==== $panel"
    python scripts/validate_panel.py "$panel" "$@" || echo "FAILED: $panel" >&2
done
