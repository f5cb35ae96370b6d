package graft.ops

import java.io.{DataOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import com.google.flatbuffers.FlatBufferBuilder
import org.apache.arrow.flatbuf.{Buffer => FbBuffer, FloatingPoint, Int => FbInt, Message, MessageHeader, MetadataVersion, Precision, SparseTensor => FbSparseTensor, SparseTensorIndex, SparseTensorIndexCOO, Tensor => FbTensor, TensorDim, Type => FbType}

/** Dense tensors as Arrow IPC MESSAGES — the reference's
  * `format/Message.fbs:92` header union enumerates `Tensor` (and
  * `SparseTensor`) beside Schema/RecordBatch/DictionaryBatch, and its
  * C++ layer ships `ipc::WriteTensor`/`ReadTensor`
  * (`cpp/src/arrow/ipc/writer.h`, `reader.h`); Arrow Java has no
  * tensor codec at all, so this hand-rolls the message exactly as the
  * [[FlightProto]]/[[Ipc]] codecs hand-roll theirs.
  *
  * Wire form (standard encapsulation): `0xFFFFFFFF` continuation,
  * int32-LE metadata size (padding included), the `Message`
  * flatbuffer with `headerType = Tensor` and `bodyLength`, pad to an
  * 8-byte boundary, then the body = the row-major element buffer,
  * little-endian. The Tensor table carries the element type
  * (FloatingPoint/DOUBLE — the engine's tensor columns are
  * `array<double>`, ops/Tensors.scala), one `TensorDim` per axis,
  * explicit row-major byte strides, and the body-relative data
  * `Buffer`. Interop is pinned against `pyarrow.ipc.write_tensor`/
  * `read_tensor` in both directions (IpcSpec).
  *
  * SparseTensor messages (the other tensor header in the reference's
  * `Message.fbs` union; `cpp/src/arrow/sparse_tensor.h`,
  * `ipc::WriteSparseTensor`) are carried for the COO index form —
  * `SparseTensorIndexCOO` with an int64 row-major (nnz × ndim)
  * indices matrix, body = indices buffer then values buffer, both
  * body-relative — which is exactly the engine's COO frame layout
  * (`sparse_tensor` oracle row, ops/Tensors.scala). Stock pyarrow
  * (≤16) binds no sparse-tensor IPC read/write, so the python half of
  * the interop pin is `pa.ipc.read_message` (the C++ envelope parser
  * identifies the header as `sparse tensor`); the flatbuffer layout
  * itself is pinned by Scala round-trip + structural asserts through
  * the independent Arrow Java PARSER classes.
  *
  * Honest scope, loud refusals: Float64 elements only (the engine's
  * tensor representation); int64 COO indices only; non-row-major
  * strides and CSR/CSC/CSF sparse index forms are refused by NAME.
  *
  * Scale note: a tensor message is a CONTROL-plane object (one model
  * matrix, one pooled embedding block — driver-sized by definition,
  * like a broadcast). Bulk numeric data rides record batches in
  * partition-parallel files; nothing here is a distributed operator.
  */
object TensorIpc {

  /** Row-major dense Float64 tensor. `shape` may be empty (a scalar —
    * one element), and any axis may be 0 (an empty tensor). */
  final case class DenseTensor(shape: Seq[Long], data: Array[Double]) {
    require(shape.forall(_ >= 0), s"negative axis in shape $shape")
    require(shape.product == data.length || (shape.isEmpty && data.length == 1),
      s"shape $shape does not address ${data.length} elements")
  }

  /** Row-major byte strides for `shape` (element width 8). */
  private def rowMajorStrides(shape: Seq[Long]): Array[Long] = {
    val out = new Array[Long](shape.length)
    var acc = 8L
    var i = shape.length - 1
    while (i >= 0) { out(i) = acc; acc *= math.max(shape(i), 1L); i -= 1 }
    out
  }

  /** The Message flatbuffer (bare, unpadded) + body for `t` — the
    * pieces a Flight frame carries as data_header/data_body. */
  private[graft] def messageParts(t: DenseTensor): (Array[Byte], Array[Byte]) = {
    val b = new FlatBufferBuilder(256)
    val typeOff = FloatingPoint.createFloatingPoint(b, Precision.DOUBLE)
    val dimOffs = t.shape.map(s => TensorDim.createTensorDim(b, s, 0)).toArray
    val shapeOff = FbTensor.createShapeVector(b, dimOffs)
    val stridesOff = FbTensor.createStridesVector(b, rowMajorStrides(t.shape))
    val bodyLen = 8L * t.data.length
    FbTensor.startTensor(b)
    FbTensor.addTypeType(b, FbType.FloatingPoint)
    FbTensor.addType(b, typeOff)
    FbTensor.addShape(b, shapeOff)
    FbTensor.addStrides(b, stridesOff)
    FbTensor.addData(b, FbBuffer.createBuffer(b, 0L, bodyLen))
    val tensorOff = FbTensor.endTensor(b)
    b.finish(Message.createMessage(
      b, MetadataVersion.V5, MessageHeader.Tensor, tensorOff, bodyLen, 0))
    val meta = b.sizedByteArray()
    val body = new Array[Byte](t.data.length * 8)
    ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      .asDoubleBuffer().put(t.data)
    (meta, body)
  }

  /** Write `t` as one encapsulated Tensor message. */
  def write(t: DenseTensor, out: OutputStream): Unit = {
    val (meta, body) = messageParts(t)
    val padded = ((meta.length + 7) / 8) * 8
    val dos = new DataOutputStream(out)
    dos.writeInt(-1) // continuation
    dos.writeInt(Integer.reverseBytes(padded)) // metadata size, LE
    dos.write(meta)
    var i = meta.length
    while (i < padded) { dos.writeByte(0); i += 1 }
    dos.write(body)
    dos.flush()
  }

  def writeBytes(t: DenseTensor): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(64 + t.data.length * 8)
    write(t, bos)
    bos.toByteArray
  }

  /** Decode one Tensor message from its (bare or prefixed) metadata
    * flatbuffer + body — the Flight-frame shape. */
  private[graft] def fromParts(meta: Array[Byte], body: Array[Byte]): DenseTensor = {
    val msg = Message.getRootAsMessage(ByteBuffer.wrap(meta))
    msg.headerType() match {
      case MessageHeader.Tensor => ()
      case MessageHeader.SparseTensor => throw new IllegalArgumentException(
        "SparseTensor message — use TensorIpc.readSparse, not read")
      case other => throw new IllegalArgumentException(
        s"not a Tensor message (headerType=$other)")
    }
    val t = msg.header(new FbTensor()).asInstanceOf[FbTensor]
    require(t.typeType() == FbType.FloatingPoint &&
      t.`type`(new FloatingPoint()).asInstanceOf[FloatingPoint]
        .precision() == Precision.DOUBLE,
      "only Float64 tensors are supported (the engine's tensor " +
        "columns are array<double>)")
    val shape = (0 until t.shapeLength()).map(i => t.shape(i).size())
    val expectStrides = rowMajorStrides(shape)
    if (t.stridesLength() > 0) {
      val got = (0 until t.stridesLength()).map(t.strides).toArray
      require(java.util.Arrays.equals(got, expectStrides),
        s"non-row-major tensor strides ${got.toSeq} (want " +
          s"${expectStrides.toSeq}) — transpose at the producer")
    }
    val buf = t.data()
    val n = (buf.length() / 8).toInt
    require(buf.offset() + buf.length() <= body.length,
      s"tensor data buffer [${buf.offset()}, +${buf.length()}) past " +
        s"body end ${body.length}")
    val out = new Array[Double](n)
    ByteBuffer.wrap(body, buf.offset().toInt, buf.length().toInt)
      .order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(out)
    DenseTensor(shape, out)
  }

  /** Read one encapsulated Tensor message. */
  def read(bytes: Array[Byte]): DenseTensor = {
    val (meta, body) = splitEncapsulated(bytes)
    fromParts(meta, body)
  }

  /** Continuation + LE metadata length + metadata + body. */
  private def splitEncapsulated(bytes: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(bytes.length >= 8, "truncated tensor message")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(0) == -1,
      "tensor message must start with the 0xFFFFFFFF continuation")
    val metaLen = bb.getInt(4)
    require(metaLen > 0 && 8 + metaLen <= bytes.length,
      s"tensor metadata length $metaLen out of range")
    (java.util.Arrays.copyOfRange(bytes, 8, 8 + metaLen),
      java.util.Arrays.copyOfRange(bytes, 8 + metaLen, bytes.length))
  }

  /** COO sparse Float64 tensor: `indices` is the row-major
    * (nnz × ndim) int64 index matrix (row i = the multi-axis position
    * of `values(i)`), the layout `SparseTensor.fbs` specifies and the
    * engine's COO frames already use. A rank-0 tensor cannot be
    * sparse (no axes to index) — refused at construction. */
  final case class CooTensor(shape: Seq[Long], indices: Array[Long],
      values: Array[Double]) {
    require(shape.nonEmpty, "COO sparse tensor needs at least one axis")
    require(shape.forall(_ >= 0), s"negative axis in shape $shape")
    require(indices.length == values.length * shape.length,
      s"${indices.length} index cells do not address ${values.length} " +
        s"values over ${shape.length} axes")
    for (i <- indices.indices) {
      val d = i % shape.length
      require(indices(i) >= 0 && indices(i) < shape(d),
        s"COO index ${indices(i)} out of range for axis $d of $shape")
    }
    def nnz: Int = values.length
    /** Arrow's canonical flag: index rows sorted lexicographically,
      * no duplicates. Computed, not asserted — the writer stamps it. */
    def isCanonical: Boolean = {
      val nd = shape.length
      (1 until nnz).forall { r =>
        var d = 0
        var cmp = 0
        while (d < nd && cmp == 0) {
          cmp = java.lang.Long.compare(
            indices((r - 1) * nd + d), indices(r * nd + d))
          d += 1
        }
        cmp < 0
      }
    }
  }

  /** The Message flatbuffer (bare, unpadded) + body for a COO sparse
    * tensor. Body = int64 indices buffer, then Float64 values buffer
    * — each a multiple of 8 bytes, so both body-relative offsets are
    * naturally 8-aligned, matching the C++ writer's layout. */
  private[graft] def messagePartsSparse(t: CooTensor): (Array[Byte], Array[Byte]) = {
    val nd = t.shape.length
    val idxBytes = 8L * t.indices.length
    val valBytes = 8L * t.values.length
    val b = new FlatBufferBuilder(256)
    val typeOff = FloatingPoint.createFloatingPoint(b, Precision.DOUBLE)
    val dimOffs = t.shape.map(s => TensorDim.createTensorDim(b, s, 0)).toArray
    val shapeOff = FbSparseTensor.createShapeVector(b, dimOffs)
    val idxTypeOff = FbInt.createInt(b, 64, true)
    // row-major strides of the (nnz, ndim) index matrix, in bytes
    val idxStridesOff = SparseTensorIndexCOO.createIndicesStridesVector(
      b, Array(8L * nd, 8L))
    SparseTensorIndexCOO.startSparseTensorIndexCOO(b)
    SparseTensorIndexCOO.addIndicesType(b, idxTypeOff)
    SparseTensorIndexCOO.addIndicesStrides(b, idxStridesOff)
    SparseTensorIndexCOO.addIndicesBuffer(b,
      FbBuffer.createBuffer(b, 0L, idxBytes))
    SparseTensorIndexCOO.addIsCanonical(b, t.isCanonical)
    val cooOff = SparseTensorIndexCOO.endSparseTensorIndexCOO(b)
    FbSparseTensor.startSparseTensor(b)
    FbSparseTensor.addTypeType(b, FbType.FloatingPoint)
    FbSparseTensor.addType(b, typeOff)
    FbSparseTensor.addShape(b, shapeOff)
    FbSparseTensor.addNonZeroLength(b, t.nnz.toLong)
    FbSparseTensor.addSparseIndexType(b, SparseTensorIndex.SparseTensorIndexCOO)
    FbSparseTensor.addSparseIndex(b, cooOff)
    FbSparseTensor.addData(b, FbBuffer.createBuffer(b, idxBytes, valBytes))
    val stOff = FbSparseTensor.endSparseTensor(b)
    val bodyLen = idxBytes + valBytes
    b.finish(Message.createMessage(
      b, MetadataVersion.V5, MessageHeader.SparseTensor, stOff, bodyLen, 0))
    val meta = b.sizedByteArray()
    val body = new Array[Byte](bodyLen.toInt)
    val bb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(t.indices)
    bb.position(idxBytes.toInt)
    bb.asDoubleBuffer().put(t.values)
    (meta, body)
  }

  /** Write `t` as one encapsulated SparseTensor message. */
  def writeSparse(t: CooTensor, out: OutputStream): Unit = {
    val (meta, body) = messagePartsSparse(t)
    val padded = ((meta.length + 7) / 8) * 8
    val dos = new DataOutputStream(out)
    dos.writeInt(-1)
    dos.writeInt(Integer.reverseBytes(padded))
    dos.write(meta)
    var i = meta.length
    while (i < padded) { dos.writeByte(0); i += 1 }
    dos.write(body)
    dos.flush()
  }

  def writeSparseBytes(t: CooTensor): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(
      256 + (t.indices.length + t.values.length) * 8)
    writeSparse(t, bos)
    bos.toByteArray
  }

  /** Decode one SparseTensor message from bare metadata + body. */
  private[graft] def fromPartsSparse(meta: Array[Byte], body: Array[Byte])
      : CooTensor = {
    val msg = Message.getRootAsMessage(ByteBuffer.wrap(meta))
    msg.headerType() match {
      case MessageHeader.SparseTensor => ()
      case MessageHeader.Tensor => throw new IllegalArgumentException(
        "dense Tensor message — use TensorIpc.read, not readSparse")
      case other => throw new IllegalArgumentException(
        s"not a SparseTensor message (headerType=$other)")
    }
    val st = msg.header(new FbSparseTensor()).asInstanceOf[FbSparseTensor]
    require(st.typeType() == FbType.FloatingPoint &&
      st.`type`(new FloatingPoint()).asInstanceOf[FloatingPoint]
        .precision() == Precision.DOUBLE,
      "only Float64 sparse tensors are supported (the engine's tensor " +
        "columns are array<double>)")
    val shape = (0 until st.shapeLength()).map(i => st.shape(i).size())
    st.sparseIndexType() match {
      case SparseTensorIndex.SparseTensorIndexCOO => ()
      case SparseTensorIndex.SparseMatrixIndexCSX =>
        throw new IllegalArgumentException(
          "CSR/CSC (SparseMatrixIndexCSX) sparse tensors are not " +
            "supported — re-encode as COO at the producer")
      case SparseTensorIndex.SparseTensorIndexCSF =>
        throw new IllegalArgumentException(
          "CSF sparse tensors are not supported — re-encode as COO " +
            "at the producer")
      case other => throw new IllegalArgumentException(
        s"unknown sparse index type $other")
    }
    val coo = st.sparseIndex(new SparseTensorIndexCOO())
      .asInstanceOf[SparseTensorIndexCOO]
    val it = coo.indicesType()
    require(it != null && it.bitWidth() == 64 && it.isSigned(),
      "only int64 COO indices are supported")
    val nd = shape.length
    val nnz = st.nonZeroLength()
    if (coo.indicesStridesLength() > 0) {
      val got = (0 until coo.indicesStridesLength())
        .map(coo.indicesStrides).toArray
      require(java.util.Arrays.equals(got, Array(8L * nd, 8L)),
        s"non-row-major COO index strides ${got.toSeq} (want " +
          s"${Seq(8L * nd, 8L)}) — transpose at the producer")
    }
    val idxBuf = coo.indicesBuffer()
    val valBuf = st.data()
    require(idxBuf.length() == 8L * nnz * nd,
      s"COO index buffer ${idxBuf.length()} bytes does not hold " +
        s"$nnz × $nd int64 cells")
    require(valBuf.length() == 8L * nnz,
      s"COO value buffer ${valBuf.length()} bytes does not hold $nnz Float64s")
    Seq(idxBuf, valBuf).foreach { buf =>
      require(buf.offset() + buf.length() <= body.length,
        s"sparse tensor buffer [${buf.offset()}, +${buf.length()}) past " +
          s"body end ${body.length}")
    }
    val indices = new Array[Long]((nnz * nd).toInt)
    ByteBuffer.wrap(body, idxBuf.offset().toInt, idxBuf.length().toInt)
      .order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(indices)
    val values = new Array[Double](nnz.toInt)
    ByteBuffer.wrap(body, valBuf.offset().toInt, valBuf.length().toInt)
      .order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(values)
    CooTensor(shape, indices, values)
  }

  /** Read one encapsulated SparseTensor message. */
  def readSparse(bytes: Array[Byte]): CooTensor = {
    val (meta, body) = splitEncapsulated(bytes)
    fromPartsSparse(meta, body)
  }
}
