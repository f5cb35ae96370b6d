#!/usr/bin/env python3
"""Stock-client interop check for the graft gRPC Flight server.

Connects pyarrow.flight — a STOCK Arrow Flight client with zero graft
code — to a running graft.ops.FlightGrpc.Server and exercises every
verb. This is the proof that the transport is real gRPC Flight on the
wire, not a bespoke framing: nothing in this script knows anything
about the server beyond host:port (+ optional basic-auth credentials).

Usage:
  python3 tools/flight_grpc_check.py PORT [USER PASSWORD]

Exit 0 and a one-line OK per verb on success; non-zero + traceback on
any mismatch. FlightGrpcSpec drives this under sbt test when a python3
with pyarrow.flight is present (it is in this image), and skips
cleanly when not.
"""
import sys

import pyarrow as pa
import pyarrow.flight as fl


def main() -> int:
    port = int(sys.argv[1])
    client = fl.connect(f"grpc://127.0.0.1:{port}")
    opts = None
    if len(sys.argv) > 3:
        token_pair = client.authenticate_basic_token(sys.argv[2], sys.argv[3])
        opts = fl.FlightCallOptions(headers=[token_pair])
        print(f"OK handshake: bearer issued ({token_pair[1][:16]}...)")

    # DoPut: upload a table under a PATH descriptor
    table = pa.table({
        "k": pa.array([1, 2, 3, 4], type=pa.int64()),
        "v": pa.array(["a", "b", None, "d"], type=pa.string()),
        "x": pa.array([1.5, None, 3.25, -0.5], type=pa.float64()),
    })
    desc = fl.FlightDescriptor.for_path("pyflight_probe")
    writer, reader = client.do_put(desc, table.schema, options=opts)
    writer.write_table(table)
    writer.done_writing()
    ack = reader.read()
    assert ack.to_pybytes() == b"4", f"DoPut ack: {ack.to_pybytes()!r}"
    writer.close()
    print("OK do_put: 4 rows acknowledged")

    # ListFlights: the uploaded view must be listed
    names = [tuple(i.descriptor.path) for i in client.list_flights(options=opts)]
    assert (b"pyflight_probe",) in names, f"list_flights: {names}"
    print(f"OK list_flights: {len(names)} flights, probe present")

    # GetSchema on a PATH descriptor
    schema = client.get_schema(desc, options=opts).schema
    assert schema.names == ["k", "v", "x"], schema
    print(f"OK get_schema: {schema.names}")

    # DoGet with a SQL CMD ticket: aggregate the uploaded rows
    sql = ("SELECT k % 2 AS parity, COUNT(*) AS n, SUM(x) AS sx "
           "FROM pyflight_probe GROUP BY k % 2 ORDER BY parity")
    info = client.get_flight_info(
        fl.FlightDescriptor.for_command(sql), options=opts)
    assert len(info.endpoints) >= 1, info
    got = []
    for ep in info.endpoints:
        got.append(client.do_get(ep.ticket, options=opts).read_all())
    result = pa.concat_tables([t for t in got if t.num_rows >= 0])
    result = result.sort_by("parity")
    assert result.column("parity").to_pylist() == [0, 1], result
    assert result.column("n").to_pylist() == [2, 2], result
    # parity 0 = {k2: null, k4: -0.5} -> -0.5; parity 1 = {1.5, 3.25} -> 4.75
    assert result.column("sx").to_pylist() == [-0.5, 4.75], result
    print(f"OK get_flight_info+do_get: {len(info.endpoints)} endpoint(s), "
          "aggregate matches")

    # Plain DoGet on a PATH ticket: full round-trip equality
    back = client.do_get(fl.Ticket(b"pyflight_probe"), options=opts).read_all()
    assert back.sort_by("k").equals(table), back
    print("OK do_get: uploaded table round-trips equal")

    # ListActions + DoAction
    actions = {a.type for a in client.list_actions(options=opts)}
    assert {"drop_view", "row_count", "clear_cache"} <= actions, actions
    n = list(client.do_action(
        fl.Action("row_count", b"pyflight_probe"), options=opts))
    assert n[0].body.to_pybytes() == b"4", n[0].body.to_pybytes()
    dropped = list(client.do_action(
        fl.Action("drop_view", b"pyflight_probe"), options=opts))
    assert dropped[0].body.to_pybytes() == b"true"
    print("OK list_actions/do_action: row_count=4, drop_view=true")

    # error path: a bad SQL ticket must surface as a FlightError
    try:
        client.do_get(fl.Ticket(b"SELECT * FROM no_such_view_xyz"),
                      options=opts).read_all()
        raise AssertionError("expected FlightError for a bad ticket")
    except fl.FlightError:
        print("OK error path: bad ticket raises FlightError")

    client.close()
    print("PYFLIGHT_INTEROP_ALL_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
