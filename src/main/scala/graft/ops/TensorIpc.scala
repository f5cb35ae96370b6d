package graft.ops

import java.io.{DataOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import com.google.flatbuffers.FlatBufferBuilder
import org.apache.arrow.flatbuf.{Buffer => FbBuffer, FloatingPoint, Message, MessageHeader, MetadataVersion, Precision, Tensor => FbTensor, TensorDim, Type => FbType}

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
  * Honest scope, loud refusals: Float64 elements only (the engine's
  * tensor representation); non-row-major strides and `SparseTensor`
  * headers are refused by NAME — sparse tensors travel as the
  * engine's COO frames (`sparse_tensor` oracle row), not as IPC
  * messages.
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
        "SparseTensor IPC messages are not supported — sparse tensors " +
          "travel as COO frames (see ops/Tensors.scala), dense ones here")
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
    require(bytes.length >= 8, "truncated tensor message")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(0) == -1,
      "tensor message must start with the 0xFFFFFFFF continuation")
    val metaLen = bb.getInt(4)
    require(metaLen > 0 && 8 + metaLen <= bytes.length,
      s"tensor metadata length $metaLen out of range")
    val meta = java.util.Arrays.copyOfRange(bytes, 8, 8 + metaLen)
    val body = java.util.Arrays.copyOfRange(bytes, 8 + metaLen, bytes.length)
    fromParts(meta, body)
  }
}
