#!/usr/bin/env bash
# Package and run the job via spark-submit --py-files (north_rule
# operational mode). In this sandbox spark-submit runs local[*]; on a
# real cluster pass --master/--deploy-mode as usual.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/gtfs2lc_spark.zip
rm -f "$ZIP"
python -c "
import zipfile, pathlib
z = zipfile.ZipFile('$ZIP', 'w')
for p in pathlib.Path('gtfs2lc_spark').rglob('*.py'):
    z.write(p, str(p))
z.close()
print('packaged', '$ZIP')
"

exec spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --py-files "$ZIP" \
  gtfs2lc_spark/job.py "$@"
