

def test_hll_sliding_merge_equals_resketch(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from halvesting_geometric_spark.operators.sketch import (
        hll_sketch,
        hll_sliding_merge,
    )

    base = dt.datetime(2026, 3, 1)
    rows = [
        (base + dt.timedelta(days=d), (d * 31 + i * 7) % 40)
        for d in range(10)
        for i in range(25)
    ]
    ev = spark.createDataFrame(rows, "day timestamp, user_id long")
    daily = hll_sketch(ev, "user_id", group_cols=("day",), lgk=6,
                       hash_method="portable")
    slid = {
        (r.window_end, r.reg): r.rho
        for r in hll_sliding_merge(daily, "day", window=3).collect()
    }
    # brute force: re-sketch the raw union of each trailing 3-day window
    for d in range(10):
        we = base + dt.timedelta(days=d)
        lo = base + dt.timedelta(days=max(0, d - 2))
        sub = ev.filter((F.col("day") >= lo) & (F.col("day") <= we))
        want = {
            r.reg: r.rho
            for r in hll_sketch(sub, "user_id", lgk=6,
                                hash_method="portable").collect()
        }
        mine = {reg: rho for (w, reg), rho in slid.items() if w == we}
        assert mine == want, we
