#!/usr/bin/env python3
"""Cross-PROCESS concurrency soak for DdStore/HllStore.

The pytest coverage exercises the swap/ledger machinery with in-process
threads (one JVM, one flock holder at a time); this soak is the missing
torture test the r7 verdict asked for: TWO WRITER PROCESSES (each its
own SparkSession/JVM) racing add() on the same store path while a
READER PROCESS loops sketches()/estimates()/applied() the whole time —
every interleaving of flock acquisition, tmp+rename generation swap,
backup retention, and recovery runs against real OS-level process
isolation, not thread scheduling.

Pass criteria, checked by the parent at the end:
  - every reader iteration saw a CONSISTENT store (reads never raise,
    applied() only ever grows, and the bucket table always corresponds
    to a prefix-closed set of applied batches — n totals monotone);
  - the final DdStore table equals the one-shot grouped sketch over
    the union of all batches (exactly-once despite two racing
    writers, including each writer RETRYING one of its batches);
  - the final HllStore estimates equal the one-shot grouped estimate;
  - the final BloomStore word table equals the one-shot Bloom filter
    (OR-merge idempotent under each writer's replays), and the
    reader's set-bit count is monotone throughout.

Usage: python tools/store_soak.py [n_batches_per_writer]
Writes nothing outside a tempdir; exits nonzero on any failure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WRITER = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "2"
from pyspark.sql import functions as F
from sonnerie_spark.session import get_spark
from sonnerie_spark.operators.sketch import BloomStore, DdStore, HllStore

writer_id = int(sys.argv[1]); n = int(sys.argv[2]); root = sys.argv[3]
spark = get_spark(f"soak-writer-{{writer_id}}", shuffle_partitions=2)
dd = DdStore(spark, os.path.join(root, "dd"))
hll = HllStore(spark, os.path.join(root, "hll"))
bf = BloomStore(spark, os.path.join(root, "bf"), num_bits=4096)

def batch_df(bid):
    # deterministic per-batch rows: 40 rows, 3 groups, values 1..13
    rows = [(f"g{{(bid + i) % 3}}", float((bid * 7 + i) % 13 + 1.0), str((bid * 31 + i) % 97))
            for i in range(40)]
    return spark.createDataFrame(rows, ["g", "x", "u"])

applied = []
for i in range(n):
    bid = writer_id * 1000 + i
    df = batch_df(bid)
    r1 = dd.add(bid, df, "g", "x")
    assert r1 is True, f"first add of {{bid}} rejected"
    # at-least-once delivery: every batch is RETRIED once; the ledger
    # must make the replay a no-op
    r2 = dd.add(bid, df, "g", "x")
    assert r2 is False, f"replay of {{bid}} was applied twice"
    hll.add(df, "g", "u")
    hll.add(df, "g", "u")  # max-merge: idempotent replay
    bf.add(df, "u")
    bf.add(df, "u")  # or-merge: idempotent replay
    applied.append(bid)
print(json.dumps({{"writer": writer_id, "applied": applied}}))
"""

READER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "2"
from sonnerie_spark.session import get_spark
from sonnerie_spark.operators.sketch import BloomStore, DdStore, HllStore

root = sys.argv[1]; deadline = float(sys.argv[2])
stop_file = os.path.join(root, "writers-done")
spark = get_spark("soak-reader", shuffle_partitions=2)
dd = DdStore(spark, os.path.join(root, "dd"))
hll = HllStore(spark, os.path.join(root, "hll"))
bf = BloomStore(spark, os.path.join(root, "bf"), num_bits=4096)
iters = 0
prev_applied = set()
prev_total = 0
prev_bits = 0
while not os.path.exists(stop_file) and time.time() < deadline:
    ids = dd.applied()
    assert ids >= prev_applied, f"applied() shrank: {{prev_applied}} -> {{ids}}"
    prev_applied = ids
    total = sum(r["n"] for r in dd.sketches().collect())
    # each batch adds exactly 40 rows; the table total must be exactly
    # 40 * |applied| for SOME consistent snapshot; since applied() and
    # sketches() are separate locked reads, allow the table to be
    # AHEAD of the ids we read (a writer landed in between), never
    # behind what we already saw
    assert total >= prev_total, f"bucket total shrank: {{prev_total}} -> {{total}}"
    assert total % 40 == 0, f"bucket total {{total}} not a whole batch"
    prev_total = total
    hll.estimates().collect()
    nbits = sum(bin(r["bits"]).count("1") for r in bf.sketch().collect())
    assert nbits >= prev_bits, f"bloom set-bit count shrank: {{prev_bits}} -> {{nbits}}"
    prev_bits = nbits
    iters += 1
print(json.dumps({{"reader_iters": iters, "final_applied": sorted(prev_applied)}}))
"""

CHECK = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "4"
from sonnerie_spark.session import get_spark
from sonnerie_spark.operators.sketch import (
    BloomStore, DdStore, HllStore, bloom_sketch, dd_sketch_grouped,
    hll_sketch_grouped,
)

root = sys.argv[1]; n = int(sys.argv[2])
spark = get_spark("soak-check", shuffle_partitions=4)

def batch_df(bid):
    rows = [(f"g{{(bid + i) % 3}}", float((bid * 7 + i) % 13 + 1.0), str((bid * 31 + i) % 97))
            for i in range(40)]
    return spark.createDataFrame(rows, ["g", "x", "u"])

ids = [w * 1000 + i for w in (1, 2) for i in range(n)]
union = batch_df(ids[0])
for bid in ids[1:]:
    union = union.unionByName(batch_df(bid))

dd = DdStore(spark, os.path.join(root, "dd"))
assert dd.applied() == set(ids), (sorted(dd.applied()), ids)
want = sorted(map(tuple, dd_sketch_grouped(union, "g", "x").collect()))
got = sorted(map(tuple, dd.sketches().collect()))
assert got == want, "DdStore final state != one-shot grouped sketch"

hll = HllStore(spark, os.path.join(root, "hll"))
want_h = sorted(map(tuple, hll_sketch_grouped(union, "g", "u").collect()))
got_h = sorted(map(tuple, hll.sketches().collect()))
assert got_h == want_h, "HllStore final state != one-shot grouped sketch"

bf = BloomStore(spark, os.path.join(root, "bf"))
assert bf.num_bits == 4096, bf.num_bits  # params adopted from disk
want_b = sorted(map(tuple, bloom_sketch(union, "u", num_bits=4096).collect()))
got_b = sorted(map(tuple, bf.sketch().collect()))
assert got_b == want_b, "BloomStore final state != one-shot filter"
print("CHECK-OK")
"""


def _dump_stderr(errlogs: list[str]) -> None:
    for path in errlogs:
        try:
            with open(path) as f:
                tail = f.read()[-4000:]
        except OSError:
            continue
        if tail.strip():
            print(f"--- {path} ---")
            print(tail)


def main() -> None:
    import time

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    root = tempfile.mkdtemp(prefix="store_soak_")
    deadline = time.time() + 240  # reader stops when writers are done anyway
    env = dict(os.environ)
    errlogs: list[str] = []

    def spawn(code: str, *args: str) -> subprocess.Popen:
        # stderr goes to a per-process file (NOT devnull): when a writer
        # or the reader trips an invariant, the assertion traceback from
        # that exact interleaving is the whole point of the soak
        log = open(os.path.join(root, f"stderr-{len(errlogs)}.log"), "w")
        errlogs.append(log.name)
        return subprocess.Popen(
            [sys.executable, "-c", code.format(repo=REPO), *args],
            stdout=subprocess.PIPE,
            stderr=log,
            env=env,
            text=True,
        )

    w1 = spawn(WRITER, "1", str(n), root)
    w2 = spawn(WRITER, "2", str(n), root)
    # reader runs until both writers exit (parent shortens its deadline)
    rd = spawn(READER, root, str(deadline))

    out1, _ = w1.communicate(timeout=600)
    out2, _ = w2.communicate(timeout=600)
    # writers done: signal the reader to finish its loop and report
    open(os.path.join(root, "writers-done"), "w").close()
    try:
        rd_out, _ = rd.communicate(timeout=120)
    except subprocess.TimeoutExpired:
        rd.kill()
        rd_out, _ = rd.communicate(timeout=30)
        print("FAIL: reader did not stop on the done signal")
        sys.exit(1)
    rd_status = f"exit {rd.returncode}"
    if rd.returncode != 0:
        print(f"FAIL: reader died mid-soak: {rd_out}")
        _dump_stderr(errlogs)
        sys.exit(1)

    ok = True
    for name, proc, out in (("writer1", w1, out1), ("writer2", w2, out2)):
        if proc.returncode != 0:
            print(f"FAIL: {name} exit {proc.returncode}: {out}")
            ok = False
        else:
            print(f"{name}: {out.strip().splitlines()[-1]}")
    print(f"reader: {rd_status}; last line: {rd_out.strip().splitlines()[-1] if rd_out.strip() else '(no output)'}")
    if not ok:
        _dump_stderr(errlogs)
        sys.exit(1)

    chk = spawn(CHECK, root, str(n))
    chk_out, _ = chk.communicate(timeout=600)
    print(chk_out.strip().splitlines()[-1] if chk_out.strip() else "(no check output)")
    if chk.returncode != 0 or "CHECK-OK" not in chk_out:
        print("FAIL: final-state check")
        sys.exit(1)
    print(json.dumps({"soak": "pass", "batches_per_writer": n}))


if __name__ == "__main__":
    main()
