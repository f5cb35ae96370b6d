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
