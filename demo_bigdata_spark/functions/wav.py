"""Pure-stdlib WAV codec (``wave`` + ``struct``) for the multimodal audio
tier — the audio analog of functions/png.py (round-9 VERDICT item 7).

The container ships no soundfile/librosa, but RIFF/WAVE PCM needs nothing
beyond the stdlib ``wave`` reader and integer unpacking, which is enough to
give ``multimodal.decode_audio_real`` a REAL decoder over real bytes next
to the deterministic fake twin (``audio_windows_fake``).

Scope: uncompressed PCM, 8-bit unsigned or 16-bit signed little-endian,
any channel count (channels are averaged to mono integer samples with
floor division — deterministic, SQL-replayable). Compressed/float WAV
raises ValueError; ``decode_audio_real`` surfaces the reason per row
rather than crashing the batch.

Adversarial-input hardening: the declared frame count is bounded BEFORE
reading sample data, so a forged header cannot balloon executor memory.
"""

from __future__ import annotations

import io
import struct
import wave

#: Default decode budget: 60 s at 48 kHz stereo 16-bit ≈ 11.5 MB — far
#: above any feature-extraction window, far below executor OOM territory.
MAX_FRAMES = 4_000_000


def encode_wav(
    samples: list[int],
    sample_rate: int = 8000,
    sampwidth: int = 2,
) -> bytes:
    """Encode mono integer samples as a PCM WAV blob. ``sampwidth`` 2 =
    16-bit signed LE (samples in [-32768, 32767]); 1 = 8-bit unsigned
    (samples in [0, 255])."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        if sampwidth == 2:
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        elif sampwidth == 1:
            w.writeframes(bytes(samples))
        else:
            raise ValueError(f"unsupported sampwidth {sampwidth}")
    return buf.getvalue()


def decode_wav(
    data: bytes, max_frames: int = MAX_FRAMES
) -> tuple[int, int, list[int]]:
    """Decode a PCM WAV blob -> (n_channels, sample_rate, mono_samples).

    16-bit frames unpack as signed LE, 8-bit as unsigned (the WAV spec's
    two PCM conventions); multi-channel frames average to mono with floor
    division so the result is integer-exact on any engine. The header's
    frame count is checked against ``max_frames`` before any allocation.
    """
    try:
        w = wave.open(io.BytesIO(data), "rb")
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a PCM WAV: {e}") from e
    with w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        nframes = w.getnframes()
        if w.getcomptype() != "NONE":
            raise ValueError(f"compressed WAV ({w.getcomptype()}) unsupported")
        if sw not in (1, 2):
            raise ValueError(f"unsupported sample width {sw} (only 8/16-bit)")
        if nch <= 0 or rate <= 0:
            raise ValueError("invalid WAV header")
        if nframes > max_frames:
            raise ValueError(
                f"WAV declares {nframes} frames, over budget {max_frames}"
            )
        raw = w.readframes(nframes)
    n = len(raw) // (sw * nch) * nch  # whole interleaved samples only
    if sw == 2:
        vals = struct.unpack(f"<{n}h", raw[: n * 2])
    else:
        vals = tuple(raw[:n])
    if nch == 1:
        mono = list(vals)
    else:
        mono = [
            sum(vals[i : i + nch]) // nch for i in range(0, n, nch)
        ]
    return nch, rate, mono
