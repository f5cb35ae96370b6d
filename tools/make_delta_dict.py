#!/usr/bin/env python3
"""Seeded pyarrow writer of DELTA-dictionary IPC fixtures (driver-side
helper for IpcPropertySpec; pyarrow is not a library dependency).

Writes to <out>:
  delta.arrows        IPC stream, emit_dictionary_deltas=True
  fdir/part0.arrow    IPC file, same batches
  expected.parquet    dictionary decoded to plain utf8 (the oracle)

The dictionary grows append-only across batches, so pyarrow emits the
first batch's dictionary followed by isDelta=true extensions — the
reference `format/Message.fbs` isDelta surface a reader must append,
never replace.
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq

if sys.argv[1] == "readback":
    # STOCK-pyarrow read of a directory of engine-written .arrow files
    # (IpcPropertySpec's delta-WRITER interop pin): decode dictionary
    # columns to their value types and print order-insensitive
    # evidence — row count, per-dictionary-column sorted distinct
    # values, and a pairing checksum sum(id * (1 + rank of cat value))
    # that catches a mis-indexed (right values, wrong rows) decode.
    import glob
    d = sys.argv[2]
    tabs = [ipc.open_file(p).read_all()
            for p in sorted(glob.glob(os.path.join(d, "*.arrow")))]
    t = pa.concat_tables(tabs, promote_options="permissive")
    dec = {}
    for name in t.column_names:
        col = t.column(name)
        if pa.types.is_dictionary(col.type):
            col = col.cast(col.type.value_type)
        dec[name] = col.to_pylist()
    print("ROWS=%d" % t.num_rows)
    for name in t.column_names:
        if pa.types.is_dictionary(t.column(name).type):
            vals = sorted(v for v in set(dec[name]) if v is not None)
            print("DISTINCT_%s=%s" % (name, ",".join(vals)))
            rank = {v: i + 1 for i, v in enumerate(vals)}
            chk = sum(i * rank.get(v, 0)
                      for i, v in zip(dec["id"], dec[name]))
            print("CHK_%s=%d" % (name, chk))
    sys.exit(0)

seed, out = int(sys.argv[1]), sys.argv[2]
rng = random.Random(seed)
schema = pa.schema([
    pa.field("s", pa.dictionary(pa.int32(), pa.utf8())),
    pa.field("v", pa.int64()),
])
words, batches, vbase = [], [], 0
for b in range(rng.randint(2, 5)):
    for _ in range(rng.randint(1, 4)):
        words.append("w%d_%d" % (seed, len(words)))
    n = rng.randint(1, 50)
    idx = pa.array(
        [rng.randrange(len(words)) if rng.random() > 0.15 else None
         for _ in range(n)], type=pa.int32())
    d = pa.DictionaryArray.from_arrays(idx, pa.array(words))
    v = pa.array(range(vbase, vbase + n), type=pa.int64())
    vbase += n
    batches.append(pa.record_batch([d, v], schema=schema))

opts = ipc.IpcWriteOptions(emit_dictionary_deltas=True)
with ipc.new_stream(os.path.join(out, "delta.arrows"), schema,
                    options=opts) as w:
    for b in batches:
        w.write_batch(b)
os.makedirs(os.path.join(out, "fdir"), exist_ok=True)
with ipc.new_file(os.path.join(out, "fdir", "part0.arrow"), schema,
                  options=opts) as w:
    for b in batches:
        w.write_batch(b)

t = pa.Table.from_batches(batches)
pq.write_table(
    pa.table({"s": t.column("s").cast(pa.string()), "v": t.column("v")}),
    os.path.join(out, "expected.parquet"))

# count dictionary messages actually emitted (sanity: >1 means the
# stream really carries deltas, not one replacement dictionary)
n_dict = 0
with open(os.path.join(out, "delta.arrows"), "rb") as f:
    rd = ipc.MessageReader.open_stream(f)
    while True:
        try:
            m = rd.read_next_message()
        except StopIteration:
            break
        if str(m.type) == "dictionary":
            n_dict += 1
print("DICT_MESSAGES=%d ROWS=%d" % (n_dict, vbase))
