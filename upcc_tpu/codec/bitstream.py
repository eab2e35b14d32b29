"""Multi-block bitstream container.

Same information content as the reference's container
(/root/reference/model/model.py:253-385): per block a header with the hyper
shape, quality pair, stream lengths and per-level point counts k, followed by
the coordinate bitstream and the two rANS payloads.  Byte-aligned struct
packing instead of the reference's O(n) bit-string concatenation
(model.py:307-308).
"""

import struct

MAGIC = b"UPCC"
# Version history:
#   2 — original container, octree coordinate coder v2 (neighbor-count ctx).
#   3 — octree coordinate coder v3 (causal neighbor-child contexts, KT
#       counting probabilities): same container layout, incompatible
#       coord_bytes payload.  Old v2 streams must fail loudly rather than
#       arithmetic-decode to silently corrupt coordinates.
#   4 — per-block flags byte; flag bit 0 = coded-occupancy refinement
#       (lossless geometry, codec/refine.py) with three occupancy stream
#       payloads after z_bytes.  Older streams fail loudly (the flags byte
#       shifts the block layout).
#   5 — flag bit 1 = per-frame measured occupancy coding tables (refine.py
#       quantize_tables) attached to the block: 1 byte n_bins + 3*n_bins
#       uint16 rows after the occ stream lengths.  The encoder attaches
#       them to the first block of each q pass; the decoder carries them
#       forward across the q run.  v4 coded streams (static sigmoid
#       tables) would silently decode to wrong occupancy bits under the
#       new tables, hence the loud version bump.
#   5+  — flag bit 2 = per-frame affine color correction (codec/
#       color_affine.py): 12 float32 (a [3, 4] YUV matrix) after the occ
#       section of the flagged block.
#   6 — flag bit 3 = residual color enhancement layer (codec/
#       color_resid.py): uint32 length + opaque payload after the affine
#       section of the flagged block.  Also from v6 on, read_container
#       REJECTS unknown flag bits: the v5 reader would have treated a
#       later build's flagged side-info as the start of coord_bytes and
#       decoded garbage — exactly the silent corruption the v4->v5 bump
#       existed to prevent.  Any future flag addition therefore needs a
#       new bit here (old builds then fail loudly) but no version bump.
VERSION = 6
FLAG_CODED_OCC = 1
FLAG_OCC_TABLES = 2
FLAG_COLOR_AFFINE = 4
FLAG_COLOR_RESID = 8
KNOWN_FLAGS = (FLAG_CODED_OCC | FLAG_OCC_TABLES | FLAG_COLOR_AFFINE
               | FLAG_COLOR_RESID)


def write_container(path_or_none, blocks, scaling_factor=1.0):
    """blocks: list of dicts with keys
    origin (3 ints), levels, n_y, n_z, q (2 floats), k (3 ints),
    coord_bytes, y_bytes, z_bytes, and optionally occ_bytes (a tuple of
    three per-level occupancy streams — the coded-geometry refinement)
    plus occ_tables (uint16 [3, n_bins] measured coding tables, attached
    to the first block of each q pass).  Returns bytes if path is None."""
    out = bytearray()
    out += MAGIC
    out += struct.pack("<BfI", VERSION, scaling_factor, len(blocks))
    for b in blocks:
        occ = b.get("occ_bytes")
        tab = b.get("occ_tables") if occ else None
        aff = b.get("color_affine")
        resid = b.get("color_resid")
        flags = (FLAG_CODED_OCC if occ else 0) \
            | (FLAG_OCC_TABLES if tab is not None else 0) \
            | (FLAG_COLOR_AFFINE if aff is not None else 0) \
            | (FLAG_COLOR_RESID if resid is not None else 0)
        out += struct.pack(
            "<iiiBIIffB", *b["origin"], b["levels"], b["n_y"], b["n_z"],
            float(b["q"][0]), float(b["q"][1]), flags)
        out += struct.pack("<III", len(b["coord_bytes"]), len(b["y_bytes"]),
                           len(b["z_bytes"]))
        out += struct.pack("<iii", *[int(v) for v in b["k"]])
        if occ:
            assert len(occ) == 3
            out += struct.pack("<III", *[len(s) for s in occ])
            if tab is not None:
                import numpy as _np
                tab = _np.ascontiguousarray(tab, _np.uint16)
                assert tab.shape[0] == 3
                out += struct.pack("<B", tab.shape[1])
                out += tab.tobytes()
        if aff is not None:
            import numpy as _np
            aff = _np.ascontiguousarray(aff, _np.float32)
            assert aff.shape == (3, 4), aff.shape
            out += aff.tobytes()
        if resid is not None:
            out += struct.pack("<I", len(resid))
            out += bytes(resid)
        out += b["coord_bytes"]
        out += b["y_bytes"]
        out += b["z_bytes"]
        if occ:
            for s in occ:
                out += s
    data = bytes(out)
    if path_or_none:
        with open(path_or_none, "wb") as f:
            f.write(data)
        return None
    return data


def read_container(path_or_bytes):
    """Returns (blocks, scaling_factor)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if len(data) < 4 + struct.calcsize("<BfI"):
        raise ValueError("truncated bitstream: container header incomplete")
    if data[:4] != MAGIC:
        raise ValueError("bad magic: not a UPCC bitstream")
    ver, scaling_factor, n_blocks = struct.unpack_from("<BfI", data, 4)
    if ver != VERSION:
        raise ValueError(
            f"unsupported bitstream version {ver} (expected {VERSION}); "
            "older streams use incompatible coordinate-coder/block layouts "
            "and cannot be decoded by this build")
    pos = 4 + struct.calcsize("<BfI")
    blocks = []
    hdr_size = struct.calcsize("<iiiBIIffB") + struct.calcsize("<III") \
        + struct.calcsize("<iii")
    for _ in range(n_blocks):
        if pos + hdr_size > len(data):
            raise ValueError("truncated bitstream: block header incomplete")
        ox, oy, oz, levels, n_y, n_z, qg, qa, flags = struct.unpack_from(
            "<iiiBIIffB", data, pos)
        pos += struct.calcsize("<iiiBIIffB")
        if flags & ~KNOWN_FLAGS:
            raise ValueError(
                f"unknown container flag bits 0x{flags & ~KNOWN_FLAGS:02x}: "
                "this stream carries side information a newer build wrote; "
                "decoding it here would misparse the payload")
        lc, ly, lz = struct.unpack_from("<III", data, pos)
        pos += struct.calcsize("<III")
        k = struct.unpack_from("<iii", data, pos)
        pos += struct.calcsize("<iii")
        occ_lens, occ_tables = None, None
        if flags & FLAG_CODED_OCC:
            if pos + struct.calcsize("<III") > len(data):
                raise ValueError("truncated bitstream: occ header incomplete")
            occ_lens = struct.unpack_from("<III", data, pos)
            pos += struct.calcsize("<III")
            if flags & FLAG_OCC_TABLES:
                import numpy as _np
                if pos + 1 > len(data):
                    raise ValueError(
                        "truncated bitstream: occ table header incomplete")
                (nb,) = struct.unpack_from("<B", data, pos)
                pos += 1
                end = pos + 3 * nb * 2
                if end > len(data):
                    raise ValueError(
                        "truncated bitstream: occ tables incomplete")
                occ_tables = _np.frombuffer(
                    data[pos:end], _np.uint16).reshape(3, nb).copy()
                pos = end
        color_affine = None
        if flags & FLAG_COLOR_AFFINE:
            import numpy as _np
            end = pos + 12 * 4
            if end > len(data):
                raise ValueError(
                    "truncated bitstream: color affine incomplete")
            color_affine = _np.frombuffer(
                data[pos:end], _np.float32).reshape(3, 4).copy()
            pos = end
        color_resid = None
        if flags & FLAG_COLOR_RESID:
            if pos + 4 > len(data):
                raise ValueError(
                    "truncated bitstream: color residual header incomplete")
            (lr,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if pos + lr > len(data):
                raise ValueError(
                    "truncated bitstream: color residual incomplete")
            color_resid = data[pos:pos + lr]
            pos += lr
        if pos + lc + ly + lz + sum(occ_lens or ()) > len(data):
            raise ValueError("truncated bitstream: payload exceeds container")
        coord_bytes = data[pos:pos + lc]; pos += lc
        y_bytes = data[pos:pos + ly]; pos += ly
        z_bytes = data[pos:pos + lz]; pos += lz
        occ_bytes = None
        if occ_lens is not None:
            occ_bytes = []
            for L in occ_lens:
                occ_bytes.append(data[pos:pos + L]); pos += L
            occ_bytes = tuple(occ_bytes)
        blocks.append({"origin": (ox, oy, oz), "levels": levels, "n_y": n_y,
                       "n_z": n_z, "q": (qg, qa), "k": list(k),
                       "coord_bytes": coord_bytes, "y_bytes": y_bytes,
                       "z_bytes": z_bytes, "occ_bytes": occ_bytes,
                       "occ_tables": occ_tables,
                       "color_affine": color_affine,
                       "color_resid": color_resid})
    return blocks, scaling_factor
