#!/bin/bash
# Launch-mode + resume evidence harness (BENCH/SUBMIT.md).
# Generates a synthetic pages parquet, ships the package via
# spark-submit --py-files, runs run_checkpointed fresh and resumed, and
# prints both JSON lines.  Usage:  bash BENCH/submit_run.sh [n_pages]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
N_PAGES="${1:-4000}"
WORK="$(mktemp -d /tmp/kgce_submit.XXXX)"
trap 'rm -rf "$WORK"' EXIT

python - "$N_PAGES" "$WORK" <<'PY'
import sys
sys.path.insert(0, "/root/repo")
n, work = int(sys.argv[1]), sys.argv[2]
from kgce.session import get_spark
from kgce import synth, schemas
spark = get_spark("gen-pages", cores=8)
spark.createDataFrame(synth.gen_pages(n, seed=77), schema=schemas.PAGES) \
    .repartition(16).write.mode("overwrite").parquet(f"{work}/pages")
PY

cd "$REPO"
(cd kgce/.. && zip -qr "$WORK/kgce.zip" kgce -i '*.py')
SUBMIT="$(command -v spark-submit || echo "$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')")"
echo "# fresh run"
"$SUBMIT" --master "local[8]" --py-files "$WORK/kgce.zip" kgce/submit.py \
    --input "$WORK/pages" --work-dir "$WORK/wd" --buckets 4 --clean 2>/dev/null | tail -1
echo "# resumed run"
"$SUBMIT" --master "local[8]" --py-files "$WORK/kgce.zip" kgce/submit.py \
    --input "$WORK/pages" --work-dir "$WORK/wd" --buckets 4 --clean 2>/dev/null | tail -1
