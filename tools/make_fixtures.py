#!/usr/bin/env python3
"""Generate the checked-in ingest fixtures (FIXTURES.md §1), seed=7.

data/aggregate_test_100.csv — the aggregate_test_100 shape from the
reference's DataFusion test suite (rust/datafusion/src/test/mod.rs:88-104):
13 columns covering every int width incl. unsigned (widened per SURVEY
§1.2), both floats, two strings. 100 rows.

data/events_sample.jsonl — 200 newline-delimited JSON records with a
nested object and an array, for the JSON reader surface.

Deterministic: fixed seed, fixed formatting. Committed outputs; rerun
only to regenerate after a schema change.
"""
import json
import random

random.seed(7)

with open("data/aggregate_test_100.csv", "w") as f:
    f.write("c1,c2,c3,c4,c5,c6,c7,c8,c9,c10,c11,c12,c13\n")
    for i in range(100):
        c1 = random.choice(["a", "b", "c", "d", "e"])
        c2 = random.randint(0, 4294967295)          # UInt32
        c3 = random.randint(-128, 127)              # Int8
        c4 = random.randint(-32768, 32767)          # Int16
        c5 = random.randint(-2147483648, 2147483647)  # Int32
        c6 = i + 1                                   # Int64, unique key
        c7 = random.randint(0, 255)                  # UInt8
        c8 = random.randint(0, 65535)                # UInt16
        c9 = random.randint(0, 4294967295)           # UInt32
        c10 = random.randint(0, 18446744073709551615)  # UInt64
        c11 = f"{random.random():.6f}"               # Float32
        c12 = f"{random.random():.12f}"              # Float64
        c13 = "".join(random.choice("0123456789abcdef") for _ in range(10))
        f.write(f"{c1},{c2},{c3},{c4},{c5},{c6},{c7},{c8},{c9},{c10},{c11},{c12},{c13}\n")

with open("data/events_sample.jsonl", "w") as f:
    types = ["click", "view", "purchase"]
    for i in range(200):
        rec = {
            "id": i,
            "type": random.choice(types),
            "score": round(random.random() * 100, 4),
            "tags": random.sample(["red", "green", "blue", "gold"],
                                  random.randint(1, 3)),
            "meta": {"k": random.randint(0, 99)},
        }
        f.write(json.dumps(rec, separators=(",", ":")) + "\n")

print("wrote data/aggregate_test_100.csv + data/events_sample.jsonl")
