"""Pure-numpy media codecs for genuinely public formats.

The container has no PIL/opencv/soundfile, but two classic formats are
simple enough to implement from their public specs, which turns the
multimodal pipeline's decode step from a stub into real byte parsing:

* PGM (``P5``) — binary portable graymap: ASCII header (magic, width,
  height, maxval, ``#`` comments allowed) followed by raw 8-bit pixels.
* WAV — RIFF container with a PCM ``fmt `` chunk and a ``data`` chunk of
  little-endian int16 samples (mono, any rate).
* Y4M (``YUV4MPEG2``) — the mjpegtools raw-video interchange format:
  one ASCII stream header with space-separated tagged parameters
  (``W<width> H<height> F<num>:<den> [I?] [A?:?] [C<colorspace>] [X…]``),
  then per frame a ``FRAME[ tags]\\n`` line followed by raw planar YUV.
  The encoder writes ``Cmono`` (luma-only) streams; the decoder handles
  mono/420*/422/444 plane layouts and arbitrary tag order.

Encoders emit canonical minimal files; decoders parse the general format
(chunk-walking for WAV, comment/whitespace handling for PGM), so they
round-trip foreign files too, not just our own output.
"""

from __future__ import annotations

import struct

import numpy as np


def pgm_encode(px: np.ndarray) -> bytes:
    """8-bit grayscale array (h, w) → binary PGM (``P5``) bytes."""
    if px.ndim != 2:
        raise ValueError("pgm_encode expects a 2-D uint8 array")
    h, w = px.shape
    header = f"P5\n{w} {h}\n255\n".encode("ascii")
    return header + np.ascontiguousarray(px, dtype=np.uint8).tobytes()


def pgm_decode(blob: bytes) -> np.ndarray:
    """Binary PGM (``P5``) bytes → uint8 array (h, w).

    Implements the public netpbm header grammar: tokens separated by
    whitespace, ``#``-to-end-of-line comments allowed between tokens, a
    single whitespace byte after maxval, then ``w*h`` raw bytes.
    """
    if blob[:2] != b"P5":
        raise ValueError("not a binary PGM (P5) file")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comments
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if pos < len(blob) and blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(blob[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    n = w * h
    data = np.frombuffer(blob, dtype=np.uint8, count=n, offset=pos)
    return data.reshape(h, w)


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → canonical RIFF/WAVE PCM bytes."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    n_channels, bits = 1, 16
    byte_rate = sample_rate * n_channels * bits // 8
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate,
        block_align, bits,
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff_size = 4 + len(fmt) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data


def wav_decode(blob: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes → (sample_rate, int16 mono samples).

    Walks the RIFF chunk list (chunks are word-aligned; unknown chunks
    are skipped), so files with extra chunks (LIST/INFO, fact) parse too.
    Multi-channel input is downmixed by taking channel 0.
    """
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    n_channels = 1
    samples: np.ndarray | None = None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate = struct.unpack_from(
                "<HHI", blob, body
            )
            bits = struct.unpack_from("<H", blob, body + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            samples = np.frombuffer(blob, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    if n_channels > 1:
        samples = samples[::n_channels]
    return sample_rate, samples


# ---- Y4M (YUV4MPEG2) ----

# bytes per frame = width*height * num / den for each colorspace family
_Y4M_PLANE_RATIO: dict[str, tuple[int, int]] = {
    "mono": (1, 1),
    "420": (3, 2), "420jpeg": (3, 2), "420mpeg2": (3, 2), "420paldv": (3, 2),
    "422": (2, 1),
    "444": (3, 1),
}


def y4m_encode(
    frames: np.ndarray, fps: tuple[int, int] = (2, 1)
) -> bytes:
    """uint8 luma frames (n, h, w) → YUV4MPEG2 ``Cmono`` stream bytes."""
    if frames.ndim != 3:
        raise ValueError("y4m_encode expects a 3-D (n, h, w) uint8 array")
    n, h, w = frames.shape
    num, den = fps
    out = [f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 Cmono\n".encode("ascii")]
    data = np.ascontiguousarray(frames, dtype=np.uint8)
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(data[i].tobytes())
    return b"".join(out)


def y4m_decode(blob: bytes) -> tuple[dict, list[np.ndarray]]:
    """YUV4MPEG2 bytes → (header meta, list of uint8 luma planes (h, w)).

    Parses the public mjpegtools grammar: tagged stream-header params in
    any order, per-frame ``FRAME`` lines with optional tags, and the raw
    planar payload sized by the ``C`` colorspace (mono, 4:2:0 variants,
    4:2:2, 4:4:4). Chroma planes are parsed past but only the luma plane
    is returned — the analytics pipeline is grayscale-first, same as the
    PGM path.
    """
    nl = blob.find(b"\n")
    if nl < 0 or not blob[:9] == b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    meta: dict = {"colorspace": "420jpeg", "interlace": "p", "aspect": (1, 1)}
    for tag in blob[9:nl].split(b" "):
        if not tag:
            continue
        key, val = chr(tag[0]), tag[1:].decode("ascii")
        if key == "W":
            meta["width"] = int(val)
        elif key == "H":
            meta["height"] = int(val)
        elif key == "F":
            num, den = val.split(":")
            meta["fps"] = (int(num), int(den))
        elif key == "I":
            meta["interlace"] = val
        elif key == "A":
            num, den = val.split(":")
            meta["aspect"] = (int(num), int(den))
        elif key == "C":
            meta["colorspace"] = val
        # X<comment> and unknown tags are skipped per spec
    if "width" not in meta or "height" not in meta:
        raise ValueError("Y4M header missing W/H")
    # F is required by the mjpegtools grammar; raising HERE keeps the
    # failure inside _try_decode's skip-and-count contract — a foreign
    # F-less stream must not KeyError past the decoder (advisor r7).
    if "fps" not in meta:
        raise ValueError("Y4M header missing F (frame rate)")
    w, h = meta["width"], meta["height"]
    cs = meta["colorspace"]
    if cs not in _Y4M_PLANE_RATIO:
        raise ValueError(f"unsupported Y4M colorspace: {cs}")
    num, den = _Y4M_PLANE_RATIO[cs]
    frame_bytes = w * h * num // den
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(blob):
        fnl = blob.find(b"\n", pos)
        if fnl < 0 or blob[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME header")
        body = fnl + 1
        if body + frame_bytes > len(blob):
            raise ValueError("truncated Y4M frame payload")
        luma = np.frombuffer(blob, dtype=np.uint8, count=w * h, offset=body)
        frames.append(luma.reshape(h, w))
        pos = body + frame_bytes
    return meta, frames
