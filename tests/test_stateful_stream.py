"""applyInPandasWithState custom stateful operator vs batch oracle."""

import datetime

from pyspark.sql import functions as F

from parrsb_spark.streaming.stateful import running_totals_batch, running_totals_stream
from tests.test_streaming_lineage import EVENT_SCHEMA, _events


def test_stateful_running_totals(spark, tmp_path):
    ev = _events(spark, 400)
    pdir = str(tmp_path / "ev_parquet")
    # two files → at least one micro-batch each (maxFilesPerTrigger=1)
    ev.filter(F.col("event_id") < 200).write.parquet(pdir + "/a.parquet")
    ev.filter(F.col("event_id") >= 200).write.parquet(pdir + "/b.parquet")

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(pdir + "/*")
    )
    q = (
        running_totals_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # last emitted row per key = final running totals
        got = {
            r["event_type"]: (r["running_count"], r["running_sum"])
            for r in spark.sql(
                "SELECT event_type, running_count, running_sum FROM running_out"
            ).collect()
            # memory sink in update mode appends; take max count per key
        }
        latest = {}
        for r in spark.sql("SELECT * FROM running_out").collect():
            k = r["event_type"]
            if k not in latest or r["running_count"] > latest[k][0]:
                latest[k] = (r["running_count"], r["running_sum"])
    finally:
        q.stop()
    exp = {
        r["event_type"]: (r["running_count"], r["running_sum"])
        for r in running_totals_batch(ev).collect()
    }
    assert latest == exp
