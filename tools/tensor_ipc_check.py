#!/usr/bin/env python3
"""Stock-pyarrow half of the Tensor IPC interop pin (IpcSpec).

  tensor_ipc_check.py read <file>
     read one Arrow Tensor message written by the engine; print shape
     and an order-sensitive checksum of the elements.

  tensor_ipc_check.py write <file> <d0,d1,...>
     write a deterministic row-major float64 tensor of that shape via
     pyarrow.ipc.write_tensor (element i = i * 0.5 - 3.0).

  tensor_ipc_check.py readmsg <file>
     parse one encapsulated message ENVELOPE via pa.ipc.read_message —
     the C++ header-union parser names the type ("tensor" /
     "sparse tensor") and sizes the body. Stock pyarrow (<=16) binds
     no sparse-tensor IPC reader, so this is the python half of the
     SparseTensor interop pin.
"""
import sys

import numpy as np
import pyarrow as pa

mode, path = sys.argv[1], sys.argv[2]
if mode == "read":
    t = pa.ipc.read_tensor(pa.memory_map(path))
    arr = t.to_numpy()
    # order-sensitive checksum: dot with 1-based index
    flat = arr.reshape(-1)
    chk = float(np.dot(flat, np.arange(1, flat.size + 1)))
    print("SHAPE=%s SUMIDX=%.6f STRIDES=%s" %
          (",".join(str(d) for d in arr.shape), chk,
           ",".join(str(s) for s in t.strides)))
elif mode == "readmsg":
    m = pa.ipc.read_message(pa.memory_map(path))
    print("MSGTYPE=%s BODYLEN=%d METAVER=%s" %
          (m.type, len(m.body), m.metadata_version))
elif mode == "write":
    shape = tuple(int(d) for d in sys.argv[3].split(",") if d != "")
    n = int(np.prod(shape)) if shape else 1
    arr = (np.arange(n, dtype=np.float64) * 0.5 - 3.0).reshape(shape)
    with pa.OSFile(path, "wb") as f:
        pa.ipc.write_tensor(pa.Tensor.from_numpy(arr), f)
    print("WROTE=%d" % n)
else:
    sys.exit("unknown mode " + mode)
