"""Fetch hardening (round-7 VERDICT item 7): retry-with-backoff, the
per-worker in-flight clamp, and the hard per-row deadline that makes a
hanging URL provably unable to fail the stage (SURVEY §7.4 risk 5).

All faults are injected through fetch_urls' ``fetcher`` parameter — no
network. State that must survive across retry attempts (attempt counters,
the in-flight gauge) lives in a mutable default argument: it is pickled
empty with the closure and materializes per Python worker, which is
exactly the scope the assertions need (retries happen in the worker that
owns the row; the clamp is a per-worker bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.sources.fetch import fetch_urls


def _urls_df(spark, n: int):
    return (
        spark.range(n)
        .select(F.concat(F.lit("synthetic://doc/"), F.col("id")).alias("url"))
        .coalesce(1)  # one worker: per-worker fault state covers every row
    )


def _flaky_fetcher(fail_first: int):
    """Fails each URL's first ``fail_first`` attempts, then succeeds."""

    def fetcher(url, timeout, _state={}):  # noqa: B006 — per-worker state
        seen = _state.setdefault("attempts", {})
        seen[url] = seen.get(url, 0) + 1
        if seen[url] <= fail_first:
            return None, f"ConnectionReset: attempt {seen[url]}"
        return f"body-of-{url}", None

    return fetcher


def test_fetch_retry_recovers_flaky_origin(spark):
    df = _urls_df(spark, 8)
    out = fetch_urls(
        df,
        url_col="url",
        fetcher=_flaky_fetcher(fail_first=2),
        retries=2,
        backoff_s=0.01,
        timeout_s=1.0,
    ).collect()
    assert len(out) == 8
    assert all(r["fetch_error"] is None for r in out)
    assert all(r["body"] == f"body-of-{r['url']}" for r in out)


def test_fetch_retry_exhaustion_records_attempt_count(spark):
    df = _urls_df(spark, 3)
    out = fetch_urls(
        df,
        url_col="url",
        fetcher=_flaky_fetcher(fail_first=99),
        retries=1,
        backoff_s=0.01,
        timeout_s=1.0,
    ).collect()
    assert all(r["body"] is None for r in out)
    # the error surfaces BOTH the underlying failure and the retry budget
    assert all("(after 2 attempts)" in r["fetch_error"] for r in out)
    assert all("ConnectionReset" in r["fetch_error"] for r in out)


def _clamp_fetcher(url, timeout, _state={}):  # noqa: B006 — per-worker state
    """Reports the peak number of concurrently in-flight fetches seen by
    this worker as the row's body."""
    import threading
    import time as _time

    st = _state.setdefault(
        "g", {"lock": threading.Lock(), "cur": 0, "peak": 0}
    )
    with st["lock"]:
        st["cur"] += 1
        st["peak"] = max(st["peak"], st["cur"])
    _time.sleep(0.15)  # hold the slot so overlap is observable
    with st["lock"]:
        peak = st["peak"]
        st["cur"] -= 1
    return str(peak), None


def test_fetch_inflight_clamped_to_max_concurrency(spark):
    df = _urls_df(spark, 12)
    out = fetch_urls(
        df, url_col="url", fetcher=_clamp_fetcher, max_concurrency=3,
        retries=0, timeout_s=5.0,
    ).collect()
    peaks = [int(r["body"]) for r in out]
    assert max(peaks) <= 3, f"in-flight exceeded the clamp: {peaks}"
    # the pool actually overlapped (the clamp is binding, not vacuous)
    assert max(peaks) > 1, peaks


def _hanging_fetcher(url, timeout):
    """Ignores its timeout entirely — the worst-case straggler (hung DNS,
    half-open socket). Only the hard deadline can bound this."""
    import time as _time

    if url.endswith("/0"):
        _time.sleep(30)
        return "late", None
    return f"body-of-{url}", None


def test_fetch_hanging_url_cannot_stall_the_stage(spark):
    df = _urls_df(spark, 6)
    out = fetch_urls(
        df,
        url_col="url",
        fetcher=_hanging_fetcher,
        retries=0,
        timeout_s=0.3,  # hard deadline = 2 * 0.3 = 0.6s per row
        max_concurrency=4,
    ).collect()
    by_url = {r["url"]: r for r in out}
    hung = by_url["synthetic://doc/0"]
    assert hung["body"] is None
    assert "FetchDeadlineExceeded" in hung["fetch_error"]
    others = [r for u, r in by_url.items() if not u.endswith("/0")]
    assert len(others) == 5
    assert all(r["fetch_error"] is None and r["body"] for r in others)


def test_polite_fetch_paces_within_host(spark):
    """Per-host request starts must be >= per_host_interval_s apart, on a
    fully deterministic injected clock (concurrency=1 so the fake clock
    has a single writer)."""
    from prefect_flow_arc_alto_to_json_spark.sources.fetch import (
        fetch_urls_polite,
    )

    urls = [f"http://host-a.example/{i}" for i in range(4)] + [
        f"http://host-b.example/{i}" for i in range(4)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "premis_stored_at string")
    clock = {"t": 0.0}

    def fake_sleep(s):
        clock["t"] += s

    def fake_now():
        return clock["t"]

    def fake_fetch(url, timeout):
        return f"{clock['t']:.3f}", None

    out = fetch_urls_polite(
        df,
        per_host_interval_s=10.0,
        max_hosts_concurrency=1,
        n_host_buckets=1,
        fetcher=fake_fetch,
        sleep_fn=fake_sleep,
        time_fn=fake_now,
    ).collect()
    assert all(r["fetch_error"] is None for r in out)
    starts: dict[str, list[float]] = {}
    for r in out:
        host = r["premis_stored_at"].split("/")[2]
        starts.setdefault(host, []).append(float(r["body"]))
    assert set(starts) == {"host-a.example", "host-b.example"}
    for host, ts in starts.items():
        ts.sort()
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        assert all(g >= 10.0 - 1e-9 for g in gaps), (host, ts)


def test_polite_fetch_host_colocation(spark):
    """The repartition key (parse_url HOST) must land every URL of a host
    in exactly one partition — the property that makes a task-local
    timestamp a correct global rate limiter."""
    urls = [
        f"http://h{i % 5}.example/p/{i}" for i in range(50)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "premis_stored_at string")
    placed = (
        df.repartition(8, F.expr("parse_url(premis_stored_at, 'HOST')"))
        .select(
            F.expr("parse_url(premis_stored_at, 'HOST')").alias("host"),
            F.spark_partition_id().alias("pid"),
        )
        .groupBy("host")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .collect()
    )
    assert len(placed) == 5
    assert all(r["n_pids"] == 1 for r in placed)


def test_polite_fetch_hosts_run_concurrently(spark):
    """With a host-pool > 1 the batch completes for every host even while
    one host's queue is long — no global serialization on errors either."""
    from prefect_flow_arc_alto_to_json_spark.sources.fetch import (
        fetch_urls_polite,
    )

    urls = [f"http://big.example/{i}" for i in range(20)] + [
        "http://small.example/only"
    ]
    df = spark.createDataFrame([(u,) for u in urls], "premis_stored_at string")
    clock = {"t": 0.0}
    out = fetch_urls_polite(
        df,
        per_host_interval_s=0.0,
        max_hosts_concurrency=4,
        n_host_buckets=1,
        fetcher=lambda u, t: (u, None),
        sleep_fn=lambda s: None,
        time_fn=lambda: clock["t"],
    ).collect()
    assert len(out) == 21
    assert all(r["body"] == r["premis_stored_at"] for r in out)


def test_polite_fetch_hung_host_cannot_stall_the_stage(spark):
    """fetch_urls' stall contract holds for the polite variant: a
    transport that ignores timeout_s resolves to error rows via the
    per-host-queue hard deadline; other hosts' rows still succeed."""
    from prefect_flow_arc_alto_to_json_spark.sources.fetch import (
        fetch_urls_polite,
    )

    def hanging_fetch(url, timeout):
        if "hang" in str(url):
            import time

            time.sleep(30)
        return str(url), None

    urls = [
        "http://ok.example/1",
        "http://hang.example/2",
        "http://ok.example/3",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "premis_stored_at string")
    out = fetch_urls_polite(
        df,
        per_host_interval_s=0.0,
        timeout_s=0.2,
        max_hosts_concurrency=4,
        n_host_buckets=1,
        fetcher=hanging_fetch,
    ).collect()
    by = {r["premis_stored_at"]: r for r in out}
    assert by["http://hang.example/2"]["fetch_error"].startswith(
        "FetchDeadlineExceeded"
    )
    assert by["http://ok.example/1"]["body"] == "http://ok.example/1"
    assert by["http://ok.example/3"]["fetch_error"] is None


def test_polite_fetch_port_variants_pace_as_one_host(spark):
    """Pacing keys on urlparse().hostname — the SAME semantics as the
    partitioner's parse_url(HOST) — so http://h/a and http://h:8080/b
    share one rate limit instead of racing on distinct netloc keys."""
    from prefect_flow_arc_alto_to_json_spark.sources.fetch import (
        fetch_urls_polite,
    )

    urls = [
        "http://h.example/a",
        "http://h.example:8080/b",
        "http://h.example/c",
        "http://h.example:9090/d",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "premis_stored_at string")
    clock = {"t": 0.0}

    def fake_sleep(s):
        clock["t"] += s

    out = fetch_urls_polite(
        df,
        per_host_interval_s=10.0,
        max_hosts_concurrency=1,
        n_host_buckets=1,
        fetcher=lambda u, t: (f"{clock['t']:.3f}", None),
        sleep_fn=fake_sleep,
        time_fn=lambda: clock["t"],
    ).collect()
    starts = sorted(float(r["body"]) for r in out)
    gaps = [b - a for a, b in zip(starts, starts[1:])]
    assert all(g >= 10.0 - 1e-9 for g in gaps), starts


def test_polite_fetch_deadline_sized_per_host_queue(spark):
    """ADVICE r8 (medium): the hard deadline must be sized to the HOST's
    own queue length, not the whole Arrow batch — a 1-URL hung host inside
    a 30-row batch resolves in ~(timeout + interval) + timeout, not
    ~len(batch) * timeout (hours at production defaults)."""
    import time

    from prefect_flow_arc_alto_to_json_spark.sources.fetch import (
        fetch_urls_polite,
    )

    def hanging_fetch(url, timeout):
        if "hang" in str(url):
            time.sleep(30)
        return str(url), None

    urls = ["http://hang.example/only"] + [
        f"http://ok.example/{i}" for i in range(30)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "premis_stored_at string")
    t0 = time.monotonic()
    out = fetch_urls_polite(
        df,
        per_host_interval_s=0.05,
        timeout_s=0.3,
        max_hosts_concurrency=4,
        n_host_buckets=1,
        fetcher=hanging_fetch,
    ).collect()
    elapsed = time.monotonic() - t0
    by = {r["premis_stored_at"]: r for r in out}
    assert by["http://hang.example/only"]["fetch_error"].startswith(
        "FetchDeadlineExceeded"
    )
    assert sum(1 for r in out if r["fetch_error"] is None) == 30
    # batch-sized deadline would be (0.35 * 31 + 0.3) ≈ 11.2 s; the
    # per-host-queue deadline is 0.65 s + ok-host pacing (~1.5 s)
    assert elapsed < 8.0, elapsed


def test_polite_fetch_hung_host_skipped_in_later_batches(spark):
    """ADVICE r8 (low): a host whose runner breached its deadline may
    still be running — later batches must NOT submit a second runner for
    it (politeness race) nor let it eat a pool slot; its rows error
    immediately with FetchHostHung."""
    import time

    from prefect_flow_arc_alto_to_json_spark.sources.fetch import (
        fetch_urls_polite,
    )

    def hanging_fetch(url, timeout):
        if "hang" in str(url):
            time.sleep(30)
        return str(url), None

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        urls = ["http://hang.example/1", "http://hang.example/2"]
        df = spark.createDataFrame(
            [(u,) for u in urls], "premis_stored_at string"
        )
        out = fetch_urls_polite(
            df,
            per_host_interval_s=0.0,
            timeout_s=0.2,
            max_hosts_concurrency=2,
            n_host_buckets=1,
            fetcher=hanging_fetch,
        ).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    errs = sorted(r["fetch_error"].split(":")[0] for r in out)
    # one row hits the deadline live; the other (its own 1-row batch) is
    # skipped because the host is known-hung
    assert errs == ["FetchDeadlineExceeded", "FetchHostHung"], errs


def test_polite_fetch_case_variant_hosts_colocate_and_pace_as_one(spark):
    """ADVICE r8 (low): the partition key lowercases (lower(parse_url))
    to match the lowercased pacing key — http://Host/a and http://host/b
    must land in ONE partition and share ONE rate limit."""
    from prefect_flow_arc_alto_to_json_spark.sources.fetch import (
        fetch_urls_polite,
    )

    urls = [
        "http://H.example/a",
        "http://h.example/b",
        "http://H.EXAMPLE/c",
        "http://h.example/d",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "premis_stored_at string")
    placed = (
        df.repartition(8, F.expr("lower(parse_url(premis_stored_at, 'HOST'))"))
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .collect()
    )
    assert len(placed) == 1, "case variants must co-locate"
    clock = {"t": 0.0}

    def fake_sleep(s):
        clock["t"] += s

    out = fetch_urls_polite(
        df,
        per_host_interval_s=10.0,
        max_hosts_concurrency=1,
        n_host_buckets=1,
        fetcher=lambda u, t: (f"{clock['t']:.3f}", None),
        sleep_fn=fake_sleep,
        time_fn=lambda: clock["t"],
    ).collect()
    starts = sorted(float(r["body"]) for r in out)
    gaps = [b - a for a, b in zip(starts, starts[1:])]
    assert all(g >= 10.0 - 1e-9 for g in gaps), starts
