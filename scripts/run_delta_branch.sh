#!/usr/bin/env bash
# Run the lakehouse contract suite's delta branch against a real
# delta-spark installation.
#
# Usage:
#   scripts/run_delta_branch.sh /path/to/delta-spark-<ver>.jar[,/path/to/delta-storage-<ver>.jar] [pytest args...]
#   scripts/run_delta_branch.sh --pip [pytest args...]   # pip install delta-spark already done
#
# The contract suite (tests/test_delta_contract.py) is parameterised
# over {parquet, delta}. In this image no delta jar exists, so the 16
# delta-branch clauses skip (ledger in RUNBOOK.md §8) and the parquet
# branch carries the contract. The day a jar is available, this script
# is the single command that flips those skips to runs:
#
#   1. puts the jar(s) on the Spark classpath and enables the Delta SQL
#      extension + catalog (the documented delta-spark session config),
#   2. verifies `import delta` resolves (the python half of delta-spark
#      — pip package or PYTHONPATH),
#   3. runs ONLY the contract suite, delta params included.
#
# connectors.open_table(prefer='delta') intentionally raises
# NotImplementedError until a binding has been validated against a real
# jar — running this script IS that validation session: implement the
# DeltaTable-backed branch in sources/connectors.py, then run this
# until the 16 clauses pass. The assertions themselves need no edits;
# they were written format-agnostically on purpose.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--pip" ]]; then
    shift
else
    JARS="${1:?usage: run_delta_branch.sh <delta-jar[,storage-jar]> | --pip}"
    shift
    export PYSPARK_SUBMIT_ARGS="--jars ${JARS} \
      --conf spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension \
      --conf spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog.DeltaCatalog \
      pyspark-shell"
fi

python - <<'EOF'
try:
    import delta  # noqa: F401
except ImportError:
    raise SystemExit(
        "the python `delta` package is missing — `pip install delta-spark` "
        "or add the delta-spark python sources to PYTHONPATH"
    )
print("python delta package: OK")
EOF

exec python -m pytest tests/test_delta_contract.py -q "$@"
