#!/bin/bash
# Frozen-app build gate (reference: raw2film.spec built by PyInstaller on a
# release machine). Builds the one-dir app from raw2film_tpu.spec and smoke-
# tests the produced binary. PyInstaller is not installable in the zero-
# egress CI container, so this script exits 0 with a notice when it is
# missing; tests/test_packaging.py still validates the spec structurally.
set -euo pipefail
cd "$(dirname "$0")/.."

if ! python -c "import PyInstaller" 2>/dev/null; then
  echo "freeze_smoke: PyInstaller not installed — skipping frozen build" >&2
  echo "freeze_smoke: SKIP (spec validated by tests/test_packaging.py)"
  exit 0
fi

rm -rf build/freeze dist/raw2film-tpu
pyinstaller --clean --noconfirm --distpath dist --workpath build/freeze \
  raw2film_tpu.spec

app=dist/raw2film-tpu/raw2film-tpu
test -x "$app"
"$app" --version
"$app" --list-stocks | head -5
echo "freeze_smoke: OK ($app)"
