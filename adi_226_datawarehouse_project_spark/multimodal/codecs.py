"""Real media codecs behind the multimodal decode API.

Import-gated: PIL / soundfile are used when installed; pure-stdlib
decoders for the uncompressed container formats (24-bit BMP via
``struct``+numpy, RIFF/WAVE PCM via ``wave``) keep a REAL pixel/sample
path exercisable even in codec-less containers like this one. Each
decoder returns ``None`` for bytes no available codec can parse — the
caller (multimodal.binary_ops) decides between the simulated fallback
and strict failure.

These run inside mapInPandas Python workers over Arrow batches: one
worker per partition, per-item decode inside the batch — the standard
shape for media decode at 100 TB (the codec is per-item by nature; the
parallelism comes from partitioning, not vectorization).
"""

from __future__ import annotations

import io
import struct


def pil_image_module():
    """PIL.Image when installed, else None (import-gated)."""
    try:
        from PIL import Image  # type: ignore[import-not-found]

        return Image
    except ImportError:
        return None


def soundfile_module():
    """soundfile when installed, else None (import-gated)."""
    try:
        import soundfile  # type: ignore[import-not-found]

        return soundfile
    except ImportError:
        return None


def decode_image_bytes(b: bytes | bytearray | None) -> tuple[int, int, int, float] | None:
    """(width, height, channels, mean_luma∈[0,1]) from REAL pixels:
    any PIL-supported format when PIL is installed, else uncompressed
    24-bit BMP via the stdlib parser. None when unparseable."""
    if not isinstance(b, (bytes, bytearray)) or len(b) < 2:
        return None
    raw = bytes(b)
    Image = pil_image_module()
    if Image is not None:
        try:
            import numpy as np

            img = Image.open(io.BytesIO(raw))
            channels = len(img.getbands())
            luma = float(np.asarray(img.convert("L"), dtype=np.float64).mean()) / 255.0
            return int(img.width), int(img.height), channels, luma
        except Exception:
            return _decode_bmp(raw)
    return _decode_bmp(raw)


def _decode_bmp(b: bytes) -> tuple[int, int, int, float] | None:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): the one mainstream
    raster format decodable with zero third-party code. Rows are
    4-byte aligned, BGR order, bottom-up unless height < 0."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    (data_off,) = struct.unpack_from("<I", b, 10)
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size < 40:
        return None
    width, height = struct.unpack_from("<ii", b, 18)
    _planes, bpp = struct.unpack_from("<HH", b, 26)
    (compression,) = struct.unpack_from("<I", b, 30)
    if compression != 0 or bpp != 24 or width <= 0 or height == 0:
        return None
    h = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    if len(b) < data_off + row_bytes * h:
        return None
    import numpy as np

    px = (
        np.frombuffer(b, dtype=np.uint8, count=row_bytes * h, offset=data_off)
        .reshape(h, row_bytes)[:, : width * 3]
        .reshape(h, width, 3)
        .astype(np.float64)
    )
    # ITU-R BT.601 luma over (B, G, R) byte order
    luma = float((px[..., 2] * 0.299 + px[..., 1] * 0.587 + px[..., 0] * 0.114).mean()) / 255.0
    return width, h, 3, luma


def decode_audio_bytes(
    b: bytes | bytearray | None,
) -> tuple[int, int, float, float] | None:
    """(sample_rate, n_frames, duration_s, rms∈[0,1]) from REAL
    samples: any soundfile-supported format when installed, else
    RIFF/WAVE 16-bit PCM via the stdlib ``wave`` reader (channels are
    mean-downmixed to mono before the RMS). None when unparseable."""
    if not isinstance(b, (bytes, bytearray)) or len(b) < 12:
        return None
    raw = bytes(b)
    import numpy as np

    sf = soundfile_module()
    if sf is not None:
        try:
            data, sr = sf.read(io.BytesIO(raw), dtype="float64", always_2d=True)
            n = int(data.shape[0])
            rms = float(np.sqrt((data.mean(axis=1) ** 2).mean())) if n else 0.0
            return int(sr), n, n / float(sr), rms
        except Exception:
            pass  # fall through to the stdlib reader
    import wave

    try:
        with wave.open(io.BytesIO(raw), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            if w.getsampwidth() != 2:  # 16-bit PCM only in the stdlib path
                return None
            frames = w.readframes(n)
    except Exception:
        return None
    pcm = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    if ch > 1:
        pcm = pcm.reshape(-1, ch).mean(axis=1)
    n = int(len(pcm))
    rms = float(np.sqrt((pcm**2).mean())) if n else 0.0
    return int(sr), n, n / float(sr), rms
