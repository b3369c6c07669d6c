#!/usr/bin/env bash
# Round-6 surfaces, self-checked with in-pipeline diffs (any mismatch
# fails the run):
#
#   1. delta full-sync MERGE: ?not-matched-by-source=delete makes the
#      table EQUAL the source in one commit (updates + inserts +
#      source-absent deletes)
#   2. composite-key MERGE (?on=k1,k2)
#   3. CDC apply with an explicit transport sequence (?sequence=ts_ms,
#      Debezium-style): insert->delete under the sequence deletes; the
#      sequence column never lands in the table
#   4. hudi MERGE_ON_READ incremental batch query: log-block changes
#      resolve per instant, deleted keys vanish
#
# Usage: bash examples/full_sync_and_mor.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_full_sync}"
rm -rf "$WORK"
DTBL="$WORK/delta_sync"
CTBL="$WORK/delta_comp"
STBL="$WORK/delta_seq"
MTBL="$WORK/hudi_mor"

# 1. full sync: seed {1,2,3}, sync against {1(updated),9(new)} ->
# exactly the source survives
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v:double&values=1,1.0;2,2.0;3,3.0" \
  --sink "v+delta://$DTBL?mode=append"
python -m spark_etl_cli_spark \
  --source "src+values://?header=id:long,v:double&values=1,10.0;9,9.0" \
  --sink "src+delta://$DTBL?mode=merge&on=id&set.v=source.v&not-matched-by-source=delete"
python -m spark_etl_cli_spark \
  --source "now+delta://$DTBL" \
  --source "expected+values://?header=id:long,v:double&values=1,10.0;9,9.0" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# 2. composite key: (1,a) updates, (2,b) inserts, (1,b) untouched
python -m spark_etl_cli_spark \
  --source "v+values://?header=k1:long,k2,v:double&values=1,a,1.0;1,b,2.0" \
  --sink "v+delta://$CTBL?mode=append"
python -m spark_etl_cli_spark \
  --source "src+values://?header=k1:long,k2,v:double&values=1,a,10.0;2,b,20.0" \
  --sink "src+delta://$CTBL?mode=merge&on=k1,k2&set.v=source.v"
python -m spark_etl_cli_spark \
  --source "now+delta://$CTBL" \
  --source "expected+values://?header=k1:long,k2,v:double&values=1,a,10.0;1,b,2.0;2,b,20.0" \
  --transform "now+checked+diff://expected?id=k1,k2&handleDifferences=fail" \
  --sink "checked+console://"

# 3. sequenced CDC apply: id=1 insert(ts 100) then delete(ts 200) ->
# gone; id=2 insert(100) then update(300) -> latest wins; ts_ms is
# transport metadata and never lands in the replica
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v:double&values=5,5.0" \
  --sink "v+delta://$STBL?mode=append"
python -m spark_etl_cli_spark \
  --source "ch+values://?header=id:long,v:double,_change_type,ts_ms:long&values=1,1.0,insert,100;1,1.0,delete,200;2,2.0,insert,100;2,22.0,update_postimage,300" \
  --sink "ch+delta://$STBL?mode=cdc&on=id&sequence=ts_ms"
python -m spark_etl_cli_spark \
  --source "now+delta://$STBL" \
  --source "expected+values://?header=id:long,v:double&values=2,22.0;5,5.0" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# 4. hudi MOR incremental: create (base), log-upsert, log-delete; the
# incremental pull past the create sees exactly the surviving change
python - <<PYEOF
import sys
sys.path.insert(0, ".")
from spark_etl_cli_spark.session import get_spark
from spark_etl_cli_spark.sources.hudi_lite import (
    delete_hudi_lite, read_hudi_incremental, write_hudi_lite,
)

spark = get_spark(app_name="mor-incremental-example")
t = "$MTBL"
ts0 = write_hudi_lite(
    spark.createDataFrame([(i, float(i)) for i in range(3)], "id long, v double"),
    t, record_key="id", table_type="MERGE_ON_READ",
)
write_hudi_lite(
    spark.createDataFrame([(1, 100.0), (9, 9.0)], "id long, v double"),
    t, mode="upsert", record_key="id",
)
delete_hudi_lite(spark, t, keys=spark.createDataFrame([(9,)], "id long"))
inc = {(r.id, r.v) for r in read_hudi_incremental(spark, t, begin_instant=ts0).collect()}
assert inc == {(1, 100.0)}, f"MOR incremental mismatch: {inc}"
print("MOR incremental OK:", sorted(inc))
spark.stop()
PYEOF

echo "full_sync_and_mor: ALL CHECKS PASSED"
