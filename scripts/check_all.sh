#!/usr/bin/env bash
# Full verification recipe (what the round close-out runs):
#   1. pytest at all three fixture scales (suite is scale-portable)
#   2. full-registry DuckDB validation at sf0.01 and sf0.1
#   3. benchmark at sf0.1 (one JSON line; idle machine recommended —
#      measured noise band is ±12-35% under background load)
set -euo pipefail
cd "$(dirname "$0")/.."
for sf in sf0.001 sf0.01 sf0.1; do
  echo "== pytest @ $sf =="
  SPARK_GRAFT_TEST_SF_DIR=/root/testdata/$sf python -m pytest tests/ -q
done
for sf in sf0.01 sf0.1; do
  echo "== validate @ $sf =="
  python3 scripts/validate_registry.py /root/testdata/$sf | tail -2
done
echo "== bench @ sf0.1 =="
python3 bench.py
