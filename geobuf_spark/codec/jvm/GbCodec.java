package geobufspark;

import org.apache.spark.sql.api.java.UDF1;
import org.apache.spark.sql.api.java.UDF2;
import org.apache.spark.sql.api.java.UDF3;
import scala.collection.Seq;

/**
 * JVM-side geobuf frame decode — the per-row twin of the Python Arrow
 * kernels in codec/spark_codec.py (_tokenize_geometry + point/line cores).
 *
 * Why this exists: the Arrow kernels are vectorized but pay a ~0.25 s/task
 * Python dispatch floor plus two Arrow serdes; a JVM UDF runs inside the
 * scan stage with zero Python, the same execution shape Catalyst gives
 * from_json. Compiled with the JDK javac against the pyspark-shipped jars
 * (tools/build_jvm.py) — no sbt needed.
 *
 * Wire layout (write_feature.go:192-263 semantics, byte-identical to the
 * Python encoder): single-byte protobuf tags, 0x08 varint id (last wins),
 * 0x18 varint geometry code (first wins), 0x22 length-prefixed geometry
 * payload of zigzag varints (first wins), anything else skipped by wire
 * type (wire 2 = length-delimited jump, all others read as varint — the
 * exact rule frame_fields_walk applies).
 *
 * Error semantics mirror the Python kernels one-for-one so a corrupt frame
 * fails the task identically on either path: >63 fields, geometry payload
 * overrunning the frame, payload ending mid-varint, missing geometry/code,
 * non-point payload in Point, token count not divisible by dim in lines.
 */
public final class GbCodec {
    private GbCodec() {}

    /** Parsed frame: id, geometry code, payload token values (zigzagged). */
    static final class Frame {
        long id;
        int code = -1;
        long[] tokens;
    }

    static Frame walk(byte[] b) {
        if (b == null) return null;
        Frame f = new Frame();
        int p = 0, gs = -1, gl = 0, fields = 0;
        final int end = b.length;
        while (p < end) {
            if (++fields > 63)
                throw new IllegalArgumentException(
                    "frame with more than 64 fields - truncated or corrupt input");
            int tag = b[p++] & 0xFF;
            if ((tag & 0x7) == 2) {          // length-delimited
                long len = 0;
                int shift = 0;
                while (true) {
                    int c = b[p++] & 0xFF;
                    len |= (long) (c & 0x7F) << shift;
                    shift += 7;
                    if (c < 0x80) break;
                }
                if (tag == 0x22 && gs < 0) { gs = p; gl = (int) len; }
                p += (int) len;
                if (p > end)
                    throw new IllegalArgumentException(
                        "field payload running past the frame end - truncated or corrupt input");
            } else {                          // everything else: varint
                long v = 0;
                int shift = 0;
                while (true) {
                    int c = b[p++] & 0xFF;
                    v |= (long) (c & 0x7F) << shift;
                    shift += 7;
                    if (c < 0x80) break;
                }
                if (tag == 0x08) f.id = v;
                else if (tag == 0x18 && f.code < 0) f.code = (int) v;
            }
        }
        if (f.code < 0 || gs < 0)
            throw new IllegalArgumentException(
                "frame missing geometry-type or geometry field");
        if (gs + gl > end)
            throw new IllegalArgumentException(
                "geometry payload running past the frame end - truncated or corrupt input");
        if (gl > 0 && (b[gs + gl - 1] & 0xFF) >= 0x80)
            throw new IllegalArgumentException(
                "geometry payload ends mid-varint - truncated or corrupt input");
        // count tokens (bytes with the continuation bit clear), then decode
        int n = 0;
        for (int i = gs; i < gs + gl; i++) if ((b[i] & 0xFF) < 0x80) n++;
        long[] toks = new long[n];
        int ti = 0;
        long v = 0;
        int shift = 0;
        for (int i = gs; i < gs + gl; i++) {
            int c = b[i] & 0xFF;
            v |= (long) (c & 0x7F) << shift;
            shift += 7;
            if (c < 0x80) { toks[ti++] = v; v = 0; shift = 0; }
        }
        f.tokens = toks;
        return f;
    }

    static long unzigzag(long u) {
        return (u >>> 1) ^ -(u & 1L);
    }

    static long zigzag(long v) {
        return (v << 1) ^ (v >> 63);
    }

    static int varintLen(long v) {
        int n = 1;
        while ((v & ~0x7FL) != 0) { v >>>= 7; n++; }
        return n;
    }

    static int writeVarint(byte[] out, int p, long v) {
        while ((v & ~0x7FL) != 0) { out[p++] = (byte) ((v & 0x7F) | 0x80); v >>>= 7; }
        out[p++] = (byte) v;
        return p;
    }

    /** gb_point(geobuf) -> [id, lon_q, lat_q] (decode_points_any parity). */
    public static final class Point implements UDF1<byte[], long[]> {
        @Override
        public long[] call(byte[] b) {
            Frame f = walk(b);
            if (f == null) return null;
            if (f.tokens.length != 2)
                throw new IllegalArgumentException(
                    "not a point frame (geometry is not 2 values)");
            return new long[]{f.id, unzigzag(f.tokens[0]), unzigzag(f.tokens[1])};
        }
    }

    /**
     * gb_line_stats(geobuf) -> [id, size, first_x_q] where size is the
     * length of the decoded flat coords array (dim * n_vertices) and
     * first_x_q the first absolute quantized coordinate - the fused
     * roads-scan reduce shape of decode_lines_agg.
     */
    public static final class LineStats implements UDF1<byte[], long[]> {
        @Override
        public long[] call(byte[] b) {
            Frame f = walk(b);
            if (f == null) return null;
            int dim = f.code <= 6 ? 2 : (f.code & 0xF);
            if (f.tokens.length % dim != 0)
                throw new IllegalArgumentException(
                    "line geometry token count not divisible by dim");
            long firstX = f.tokens.length > 0 ? unzigzag(f.tokens[0]) : 0L;
            return new long[]{f.id, f.tokens.length, firstX};
        }
    }

    /**
     * gb_line_decode(geobuf) -> [id, x0,y0,x1,y1,...] - id followed by the
     * absolute quantized coords (decode_lines parity; deltas cumsum'd per
     * dimension).
     */
    public static final class LineDecode implements UDF1<byte[], long[]> {
        @Override
        public long[] call(byte[] b) {
            Frame f = walk(b);
            if (f == null) return null;
            int dim = f.code <= 6 ? 2 : (f.code & 0xF);
            int m = f.tokens.length;
            if (m % dim != 0)
                throw new IllegalArgumentException(
                    "line geometry token count not divisible by dim");
            long[] out = new long[m + 1];
            out[0] = f.id;
            for (int d = 0; d < dim; d++) {
                long acc = 0;
                for (int i = d; i < m; i += dim) {
                    acc += unzigzag(f.tokens[i]);
                    out[i + 1] = acc;
                }
            }
            return out;
        }
    }

    /**
     * gb_poly_dec(geobuf) -> [id, R, nv_1..nv_R, x0,y0,x1,y1,...] - the
     * ring-structured decode (decode_rings_kernel parity for one frame,
     * dim 2): R rings, each ring's vertex count, then the absolute
     * quantized coords with the delta state RESET at each ring start
     * (geom.go:103-111,127-157 - the first vertex of every ring is
     * encoded absolute). Stricter than the Python batch kernel on corrupt
     * counts: a ring token count that is zero, not divisible by dim, or
     * overrunning the payload throws instead of bleeding into neighbor
     * frames' token ranges.
     */
    public static final class PolyDecode implements UDF1<byte[], long[]> {
        @Override
        public long[] call(byte[] b) {
            Frame f = walk(b);
            if (f == null) return null;
            int dim = f.code <= 6 ? 2 : (f.code & 0xF);
            long[] t = f.tokens;
            int m = t.length;
            // first pass: count rings and coord tokens, validate counts
            int rings = 0, coordToks = 0;
            for (int p = 0; p < m; ) {
                long cnt = t[p];
                if (cnt <= 0 || cnt % dim != 0 || p + 1 + cnt > m)
                    throw new IllegalArgumentException(
                        "ring token count invalid or overrunning the payload"
                        + " - truncated or corrupt input");
                rings++;
                coordToks += (int) cnt;
                p += 1 + (int) cnt;
            }
            long[] out = new long[2 + rings + coordToks];
            out[0] = f.id;
            out[1] = rings;
            int ri = 2, ci = 2 + rings;
            for (int p = 0; p < m; ) {
                int cnt = (int) t[p++];
                out[ri++] = cnt / dim;
                for (int d = 0; d < dim; d++) {
                    long acc = 0;
                    for (int i = d; i < cnt; i += dim) {
                        acc += unzigzag(t[p + i]);
                        out[ci + i] = acc;
                    }
                }
                p += cnt;
                ci += cnt;
            }
            return out;
        }
    }

    /**
     * gb_poly_enc(id, coords, ring_nv) -> geobuf Polygon frame (dim 2,
     * code 3), byte-identical to encode_rings_kernel: per ring a varint
     * nv*2 then that ring's zigzag deltas with the delta state reset at
     * the ring start (geom.go:255-273), bbox min/max over ALL the
     * feature's QUANTIZED vertices (bb.go:10-37). coords is the flat
     * interleaved x,y array across all rings; ring_nv the vertices per
     * ring.
     */
    public static final class PolyEnc implements UDF3<Long, Seq<Double>, Seq<Number>, byte[]> {
        @Override
        public byte[] call(Long id, Seq<Double> coords, Seq<Number> ringNv) {
            if (id == null || coords == null || ringNv == null)
                throw new IllegalArgumentException(
                    "encode polygon: null id/coords/ring_nv - filter before encoding");
            int m = coords.size(), r = ringNv.size();
            if (m == 0 || m % 2 != 0 || r == 0)
                throw new IllegalArgumentException(
                    "polygon coords must be non-empty interleaved x,y with >=1 ring");
            long[] q = new long[m];
            scala.collection.Iterator<Double> it = coords.iterator();
            for (int i = 0; i < m; i++)
                q[i] = (long) ((double) it.next() * 1e7);
            int[] nv = new int[r];
            // Number, not Integer: Spark hands int or bigint array elements
            // depending on the column type, and erasure would defer a bad
            // cast to here anyway
            scala.collection.Iterator<Number> rit = ringNv.iterator();
            int totalV = 0;
            for (int i = 0; i < r; i++) {
                nv[i] = rit.next().intValue();
                if (nv[i] <= 0)
                    throw new IllegalArgumentException(
                        "empty ring; filter before encoding");
                totalV += nv[i];
            }
            if (totalV * 2 != m)
                throw new IllegalArgumentException(
                    "ring_nv sum does not match coords length");
            // token stream: per ring [nv*2, zigzag deltas (reset at ring)]
            long[] zz = new long[r + m];
            long minx = Long.MAX_VALUE, maxx = Long.MIN_VALUE;
            long miny = Long.MAX_VALUE, maxy = Long.MIN_VALUE;
            int glen = 0, zi = 0, vi = 0;
            for (int ring = 0; ring < r; ring++) {
                zz[zi] = (long) nv[ring] * 2;
                glen += varintLen(zz[zi]);
                zi++;
                long px = 0, py = 0;
                for (int v = 0; v < nv[ring]; v++, vi += 2) {
                    long x = q[vi], y = q[vi + 1];
                    zz[zi] = zigzag(v == 0 ? x : x - px);
                    zz[zi + 1] = zigzag(v == 0 ? y : y - py);
                    glen += varintLen(zz[zi]) + varintLen(zz[zi + 1]);
                    zi += 2;
                    px = x; py = y;
                    if (x < minx) minx = x;
                    if (x > maxx) maxx = x;
                    if (y < miny) miny = y;
                    if (y > maxy) maxy = y;
                }
            }
            long zb0 = zigzag(minx), zb1 = zigzag(miny);
            long zb2 = zigzag(maxx), zb3 = zigzag(maxy);
            int blen = varintLen(zb0) + varintLen(zb1) + varintLen(zb2) + varintLen(zb3);
            long uid = id;
            byte[] out = new byte[1 + varintLen(uid) + 2
                    + 1 + varintLen(glen) + glen + 1 + varintLen(blen) + blen];
            int p = 0;
            out[p++] = 0x08; p = writeVarint(out, p, uid);
            out[p++] = 0x18; out[p++] = 0x03;
            out[p++] = 0x22; p = writeVarint(out, p, glen);
            for (int i = 0; i < zi; i++) p = writeVarint(out, p, zz[i]);
            out[p++] = 0x2A; p = writeVarint(out, p, blen);
            p = writeVarint(out, p, zb0); p = writeVarint(out, p, zb1);
            p = writeVarint(out, p, zb2); p = writeVarint(out, p, zb3);
            return out;
        }
    }

    /**
     * gb_point_enc(id, lon, lat) -> geobuf frame, byte-identical to the
     * Arrow kernel encode_points_kernel (write_feature.go:192-263 layout:
     * 0x08 id | 0x18 code=1 | 0x22 zigzag varint x,y | 0x2A degenerate
     * bbox x,y,x,y). Quantize is (long)(c * 1e7) - Go/numpy truncation
     * toward zero (geom.go:173-179).
     */
    public static final class PointEnc implements UDF3<Long, Double, Double, byte[]> {
        @Override
        public byte[] call(Long id, Double lon, Double lat) {
            if (id == null || lon == null || lat == null)
                throw new IllegalArgumentException(
                    "encode point: null id/lon/lat - filter before encoding");
            long zx = zigzag((long) (lon * 1e7));
            long zy = zigzag((long) (lat * 1e7));
            long uid = id;
            int lx = varintLen(zx), ly = varintLen(zy);
            int glen = lx + ly, blen = 2 * glen;
            byte[] out = new byte[1 + varintLen(uid) + 2
                    + 1 + varintLen(glen) + glen + 1 + varintLen(blen) + blen];
            int p = 0;
            out[p++] = 0x08; p = writeVarint(out, p, uid);
            out[p++] = 0x18; out[p++] = 0x01;
            out[p++] = 0x22; p = writeVarint(out, p, glen);
            p = writeVarint(out, p, zx); p = writeVarint(out, p, zy);
            out[p++] = 0x2A; p = writeVarint(out, p, blen);
            p = writeVarint(out, p, zx); p = writeVarint(out, p, zy);
            p = writeVarint(out, p, zx); p = writeVarint(out, p, zy);
            return out;
        }
    }

    /**
     * gb_line_enc(id, coords) -> geobuf LineString frame (dim 2, code 2),
     * byte-identical to encode_lines_kernel: per-vertex deltas zigzag
     * varint packed (geom.go:204-246), bbox min/max over the QUANTIZED
     * lattice (bb.go:10-37). coords is the flat interleaved x,y array.
     */
    public static final class LineEnc implements UDF2<Long, Seq<Double>, byte[]> {
        @Override
        public byte[] call(Long id, Seq<Double> coords) {
            if (id == null || coords == null)
                throw new IllegalArgumentException(
                    "encode line: null id/coords - filter before encoding");
            int m = coords.size();
            if (m == 0 || m % 2 != 0)
                throw new IllegalArgumentException(
                    "line coords must be non-empty interleaved x,y (dim 2)");
            // one iterator traversal into a primitive array: per-index
            // apply() pays generic dispatch + unboxing twice per vertex,
            // which dominates the encode at production vertex counts
            long[] q = new long[m];
            scala.collection.Iterator<Double> it = coords.iterator();
            for (int i = 0; i < m; i++)
                q[i] = (long) ((double) it.next() * 1e7);
            long[] zz = new long[m];
            long minx = Long.MAX_VALUE, maxx = Long.MIN_VALUE;
            long miny = Long.MAX_VALUE, maxy = Long.MIN_VALUE;
            long px = 0, py = 0;
            int glen = 0;
            for (int i = 0; i < m; i += 2) {
                long x = q[i], y = q[i + 1];
                zz[i] = zigzag(i == 0 ? x : x - px);
                zz[i + 1] = zigzag(i == 0 ? y : y - py);
                glen += varintLen(zz[i]) + varintLen(zz[i + 1]);
                px = x; py = y;
                if (x < minx) minx = x;
                if (x > maxx) maxx = x;
                if (y < miny) miny = y;
                if (y > maxy) maxy = y;
            }
            long zb0 = zigzag(minx), zb1 = zigzag(miny);
            long zb2 = zigzag(maxx), zb3 = zigzag(maxy);
            int blen = varintLen(zb0) + varintLen(zb1) + varintLen(zb2) + varintLen(zb3);
            long uid = id;
            byte[] out = new byte[1 + varintLen(uid) + 2
                    + 1 + varintLen(glen) + glen + 1 + varintLen(blen) + blen];
            int p = 0;
            out[p++] = 0x08; p = writeVarint(out, p, uid);
            out[p++] = 0x18; out[p++] = 0x02;
            out[p++] = 0x22; p = writeVarint(out, p, glen);
            for (long v : zz) p = writeVarint(out, p, v);
            out[p++] = 0x2A; p = writeVarint(out, p, blen);
            p = writeVarint(out, p, zb0); p = writeVarint(out, p, zb1);
            p = writeVarint(out, p, zb2); p = writeVarint(out, p, zb3);
            return out;
        }
    }

    /**
     * gb_frames(file_bytes) -> array&lt;binary&gt; of raw feature frames —
     * the JVM twin of core.read_frames with skip_metadata=False (the
     * subfile/bench contract: mid-file ranges and freshly written
     * buffers carry no gob metadata dummy; reader.go:84-93 framing:
     * 0x0A, varint length, frame bytes). Lets the whole concurrent
     * many-file read (the reference's geobuf_concurrent.go:18-63
     * headline path) run binaryFile-scan → explode → decode with zero
     * Python in the plan. Truncated streams fail the task loudly, same
     * as the Python reader's assert.
     */
    public static final class Frames implements UDF1<byte[], java.util.List<byte[]>> {
        @Override
        public java.util.List<byte[]> call(byte[] b) {
            if (b == null) return null;
            java.util.ArrayList<byte[]> out = new java.util.ArrayList<>();
            int p = 0;
            final int end = b.length;
            while (p < end) {
                if ((b[p] & 0xFF) != 0x0A)
                    throw new IllegalArgumentException(
                        "bad frame tag at offset " + p + " - truncated or corrupt stream");
                p++;
                long len = 0;
                int shift = 0;
                while (true) {
                    if (p >= end)
                        throw new IllegalArgumentException(
                            "frame length varint running past the stream end");
                    int c = b[p++] & 0xFF;
                    len |= (long) (c & 0x7F) << shift;
                    shift += 7;
                    if (c < 0x80) break;
                }
                if (p + len > end)
                    throw new IllegalArgumentException(
                        "frame payload running past the stream end - truncated or corrupt stream");
                out.add(java.util.Arrays.copyOfRange(b, p, p + (int) len));
                p += (int) len;
            }
            return out;
        }
    }
}
