"""Native ADPCM audio decode: WAV IMA/DVI (0x0011), WAV Microsoft
(0x0002), and AIFF-C 'ima4' (functions/multimodal.py::
_decode_adpcm_wav/_decode_ima4). ADPCM is fixed-table delta
prediction — NOT entropy coding — so stdlib+numpy owns it exactly
like G.711 did.

The encoders here are written independently from the decoder,
straight from the IMA recommended-practices algorithm and the
Microsoft WAVE ADPCM spec, as SCALAR transliterations (one sample at
a time, plain python ints). Each encoder also computes the
reconstruction a spec-conforming decoder must produce, so the
round-trip assertion `decode(encode(x)) == scalar_reconstruction` is
simultaneously the vectorized-vs-scalar pin the G.711/BT.601 paths
use."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_audio

from test_image_decode import _rng

# IMA spec constants, re-typed here independently of the module.
_STEP = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_ADJ = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
_MS_COEFS = ((256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
             (460, -208), (392, -232))


def _trunc_div(a: int, b: int) -> int:
    """C-style integer division (truncation toward zero)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _ima_enc_step(x: int, pred: int, idx: int):
    """One IMA encode step; returns (nibble, reconstructed_pred,
    new_idx) with the update mirroring the spec's decoder."""
    step = _STEP[idx]
    diff = x - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    d = step >> 3
    if nib & 1:
        d += step >> 2
    if nib & 2:
        d += step >> 1
    if nib & 4:
        d += step
    pred = pred - d if nib & 8 else pred + d
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _ADJ[nib]))
    return nib, pred, idx


def _pad_frames(samples: np.ndarray, spb: int):
    """Pad to whole blocks by repeating the final frame (what real
    encoders do); returns (padded, n_blocks)."""
    n = len(samples)
    n_blocks = max(1, -(-n // spb))
    pad = n_blocks * spb - n
    if pad:
        samples = np.vstack([samples, np.repeat(samples[-1:], pad, axis=0)])
    return samples, n_blocks


def _ima_wav_bytes(samples: np.ndarray, rate: int, groups: int = 2,
                   spb: int | None = None, with_fact: bool = True):
    """WAV IMA ADPCM stream + the scalar reconstruction. `groups` =
    4-byte nibble groups per channel per block; the per-channel block
    header stores the first sample verbatim and the carried-over step
    index."""
    n, ch = samples.shape
    avail = groups * 8 + 1
    spb = avail if spb is None else spb
    block_align = 4 * ch + groups * 4 * ch
    x, n_blocks = _pad_frames(samples, spb)
    idx = [0] * ch
    recon = np.empty((n_blocks * spb, ch), dtype=np.int16)
    data = bytearray()
    for b in range(n_blocks):
        base = b * spb
        pred = [0] * ch
        for c in range(ch):
            pred[c] = int(x[base, c])
            recon[base, c] = pred[c]
            data += struct.pack("<hBB", pred[c], idx[c], 0)
        nibs = [[] for _ in range(ch)]
        for s in range(1, spb):
            for c in range(ch):
                nb, pred[c], idx[c] = _ima_enc_step(int(x[base + s, c]), pred[c], idx[c])
                nibs[c].append(nb)
                recon[base + s, c] = pred[c]
        for c in range(ch):
            nibs[c] += [0] * (groups * 8 - len(nibs[c]))
        for g in range(groups):
            for c in range(ch):
                for k in range(4):
                    data.append(nibs[c][g * 8 + 2 * k] | (nibs[c][g * 8 + 2 * k + 1] << 4))
    fmt = struct.pack("<HHIIHHHH", 0x11, ch, rate, rate, block_align, 4, 2, spb)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if with_fact:
        chunks += b"fact" + struct.pack("<II", 4, n)
    chunks += b"data" + struct.pack("<I", len(data)) + bytes(data)
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    return payload, recon[: n if with_fact else n_blocks * spb]


def _ms_wav_bytes(samples: np.ndarray, rate: int, spb: int = 32,
                  bpred: int = 0, with_fact: bool = True):
    """WAV Microsoft ADPCM stream + the scalar reconstruction, per the
    MS WAVE spec: per-channel header (coef index, iDelta, sample1,
    sample2 — sample2 is the older and emits first), then
    high-nibble-first codes alternating channels."""
    n, ch = samples.shape
    nib_per_block = (spb - 2) * ch
    assert nib_per_block % 2 == 0, "use spb/ch giving whole bytes"
    block_align = 7 * ch + nib_per_block // 2
    x, n_blocks = _pad_frames(samples, spb)
    c1, c2 = _MS_COEFS[bpred]
    recon = np.empty((n_blocks * spb, ch), dtype=np.int16)
    data = bytearray()
    for b in range(n_blocks):
        base = b * spb
        s2 = [int(x[base, c]) for c in range(ch)]
        s1 = [int(x[base + 1, c]) for c in range(ch)]
        delta = [64] * ch
        for c in range(ch):
            recon[base, c] = s2[c]
            recon[base + 1, c] = s1[c]
        data += bytes([bpred] * ch)
        for arr in (delta, s1, s2):
            for c in range(ch):
                data += struct.pack("<h", arr[c])
        nibs = []
        for s in range(2, spb):
            for c in range(ch):
                predicted = _trunc_div(s1[c] * c1 + s2[c] * c2, 256)
                err = int(x[base + s, c]) - predicted
                nb = max(-8, min(7, _trunc_div(err, delta[c])))
                pred = max(-32768, min(32767, predicted + nb * delta[c]))
                s2[c], s1[c] = s1[c], pred
                delta[c] = max(16, _trunc_div(_MS_ADAPT[nb & 0xF] * delta[c], 256))
                recon[base + s, c] = pred
                nibs.append(nb & 0xF)
        for i in range(0, len(nibs), 2):
            data.append((nibs[i] << 4) | nibs[i + 1])
    fmt = struct.pack("<HHIIHHHHH", 0x0002, ch, rate, rate, block_align, 4,
                      4 + 4 * len(_MS_COEFS), spb, len(_MS_COEFS))
    for a, b2 in _MS_COEFS:
        fmt += struct.pack("<hh", a, b2)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if with_fact:
        chunks += b"fact" + struct.pack("<II", 4, n)
    chunks += b"data" + struct.pack("<I", len(data)) + bytes(data)
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    return payload, recon[: n if with_fact else n_blocks * spb]


def _f80(rate: float) -> bytes:
    """80-bit extended float for the AIFF COMM rate (integer rates)."""
    m = int(rate)
    e = 0
    while m < 1 << 63:
        m <<= 1
        e += 1
    return struct.pack(">HQ", 16383 + 63 - e, m)


def _ima4_bytes(samples: np.ndarray, rate: int):
    """AIFF-C 'ima4' stream + scalar reconstruction: 34-byte packets
    per channel (2-byte BE header: predictor top 9 bits | step index;
    32 low-nibble-first code bytes → 64 samples), channel packets
    interleaved per packet frame; COMM numSampleFrames trims the
    final packet's padding."""
    n, ch = samples.shape
    x, n_pkts = _pad_frames(samples, 64)
    pred = [0] * ch
    idx = [0] * ch
    recon = np.empty((n_pkts * 64, ch), dtype=np.int16)
    data = bytearray()
    for p in range(n_pkts):
        for c in range(ch):
            h = (pred[c] & 0xFF80) | (idx[c] & 0x7F)
            data += struct.pack(">H", h)
            pc = h & 0xFF80
            if pc & 0x8000:
                pc -= 0x10000
            pred[c] = pc  # decoder state resets to the quantized header
            nibs = []
            for s in range(64):
                nb, pred[c], idx[c] = _ima_enc_step(int(x[p * 64 + s, c]), pred[c], idx[c])
                nibs.append(nb)
                recon[p * 64 + s, c] = pred[c]
            for k in range(0, 64, 2):
                data.append(nibs[k] | (nibs[k + 1] << 4))
    comm = struct.pack(">hIh", ch, n, 16) + _f80(rate) + b"ima4" + b"\x00\x00"
    ssnd = struct.pack(">II", 0, 0) + bytes(data)
    chunks = (b"COMM" + struct.pack(">I", len(comm)) + comm
              + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    payload = b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFC" + chunks
    return payload, recon[:n]


def _smooth(seed: int, n: int, ch: int, amp: int = 12000) -> np.ndarray:
    """Deterministic smooth-ish waveform (sine + noise) per channel."""
    rng = _rng(seed)
    t = np.arange(n)[:, None]
    phase = rng.uniform(0, 6.28, size=(1, ch))
    wave = amp * np.sin(t / 37.0 + phase) + rng.integers(-300, 300, size=(n, ch))
    return np.clip(wave, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("ch", [1, 2])
def test_ima_wav_roundtrip_scalar_pin(ch):
    """decode == the scalar encoder's reconstruction (exact), and the
    reconstruction tracks the source (sanity that the codec chain is
    actually ADPCM, not an identity stub)."""
    x = _smooth(900 + ch, 345, ch)
    payload, recon = _ima_wav_bytes(x, 16000)
    got, rate = decode_audio(payload)
    assert rate == 16000 and got.dtype == np.int16
    np.testing.assert_array_equal(got, recon)
    assert np.abs(got.astype(np.int32) - x.astype(np.int32)).mean() < 1500


@pytest.mark.parametrize("ch", [1, 2])
def test_ms_wav_roundtrip_scalar_pin(ch):
    x = _smooth(910 + ch, 301, ch)
    payload, recon = _ms_wav_bytes(x, 22050, bpred=1 if ch == 2 else 0)
    got, rate = decode_audio(payload)
    assert rate == 22050
    np.testing.assert_array_equal(got, recon)
    assert np.abs(got.astype(np.int32) - x.astype(np.int32)).mean() < 1500


@pytest.mark.parametrize("ch", [1, 2])
def test_ima4_aifc_roundtrip_scalar_pin(ch):
    """Padding trim: 150 frames span 3 packets (192 slots); COMM must
    trim back to 150."""
    x = _smooth(920 + ch, 150, ch)
    payload, recon = _ima4_bytes(x, 44100)
    got, rate = decode_audio(payload)
    assert rate == 44100 and got.shape == (150, ch)
    np.testing.assert_array_equal(got, recon)
    assert np.abs(got.astype(np.int32) - x.astype(np.int32)).mean() < 1500


def test_ima_wav_fact_trims_final_block():
    """97 frames at 17 samples/block → 6 blocks of capacity 102; the
    fact chunk must trim the decoded stream back to 97. Without fact,
    the padded tail decodes too."""
    x = _smooth(930, 97, 1)
    payload, recon = _ima_wav_bytes(x, 8000)
    got, _ = decode_audio(payload)
    assert got.shape == (97, 1)
    np.testing.assert_array_equal(got, recon)
    nofact, recon_full = _ima_wav_bytes(x, 8000, with_fact=False)
    got_full, _ = decode_audio(nofact)
    assert got_full.shape == (102, 1)
    np.testing.assert_array_equal(got_full, recon_full)


def test_ima_wav_index_carries_across_blocks():
    """The encoder carries the step index across block boundaries and
    stores it in each block header; a decoder that reset it to zero
    would diverge from the reconstruction on blocks ≥ 2."""
    x = _smooth(931, 340, 1, amp=30000)  # hot signal drives the index high
    payload, recon = _ima_wav_bytes(x, 8000, groups=4)
    block_align = 4 + 4 * 4  # mono: 4-byte header + 4 groups of 4 bytes
    hdr2_index = payload[payload.find(b"data") + 8 + block_align + 2]
    assert hdr2_index > 0  # block 2's stored index really is nonzero
    got, _ = decode_audio(payload)
    np.testing.assert_array_equal(got, recon)


def test_adpcm_malformed_and_unsupported():
    x = _smooth(940, 80, 1)
    payload, _ = _ima_wav_bytes(x, 8000)
    # step index > 88 in a block header is malformed
    bad = bytearray(payload)
    bad[bad.find(b"data") + 8 + 2] = 99
    with pytest.raises(ValueError, match="step index"):
        decode_audio(bytes(bad))
    # partial trailing block (consistent chunk size, data not a
    # multiple of nBlockAlign)
    bad = bytearray(payload)
    doff = bad.find(b"data")
    dsz = struct.unpack_from("<I", bad, doff + 4)[0]
    struct.pack_into("<I", bad, doff + 4, dsz - 3)
    del bad[doff + 8 + dsz - 3 : doff + 8 + dsz]
    with pytest.raises(ValueError, match="block"):
        decode_audio(bytes(bad))
    # wSamplesPerBlock beyond the block's nibble capacity
    bad = bytearray(payload)
    fmt_off = bad.find(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_off + 18, 400)
    with pytest.raises(ValueError, match="wSamplesPerBlock"):
        decode_audio(bytes(bad))
    # fact declaring more frames than the blocks hold
    bad = bytearray(payload)
    struct.pack_into("<I", bad, bad.find(b"fact") + 8, 10_000)
    with pytest.raises(ValueError, match="fact"):
        decode_audio(bytes(bad))
    # MS: predictor index >= the declared coefficient count
    ms, _ = _ms_wav_bytes(x, 8000)
    bad = bytearray(ms)
    bad[bad.find(b"data") + 8] = len(_MS_COEFS)
    with pytest.raises(ValueError, match="predictor index"):
        decode_audio(bytes(bad))
    # ima4: SSND not a multiple of the packet frame
    ima4, _ = _ima4_bytes(x, 8000)
    bad = bytearray(ima4)
    ssnd_off = bad.find(b"SSND")
    sz = struct.unpack_from(">I", bad, ssnd_off + 4)[0]
    struct.pack_into(">I", bad, ssnd_off + 4, sz - 5)
    del bad[ssnd_off + 8 + sz - 5 : ssnd_off + 8 + sz]
    with pytest.raises(ValueError, match="packet"):
        decode_audio(bytes(bad))
    # 16-bit "ADPCM" stays codec-gated (NotImplementedError, not a crash)
    bad = bytearray(payload)
    struct.pack_into("<H", bad, fmt_off + 14, 16)
    with pytest.raises(NotImplementedError, match="4-bit"):
        decode_audio(bytes(bad))


def test_adpcm_audio_stats_distributed_with_quarantine(spark):
    """All three ADPCM containers through the Spark featurizer in one
    Arrow batch, with a corrupt one quarantined."""
    from flink_hiveorc_spark.functions.multimodal import audio_stats

    x = _smooth(950, 200, 2)
    ima, ima_rec = _ima_wav_bytes(x, 16000)
    ms, ms_rec = _ms_wav_bytes(x, 16000)
    qt, qt_rec = _ima4_bytes(x, 16000)
    bad = bytearray(ima)
    bad[bad.find(b"data") + 8 + 2] = 120  # step index out of range
    df = spark.createDataFrame(
        [(1, bytearray(ima)), (2, bytearray(ms)), (3, bytearray(qt)),
         (4, bad)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in audio_stats(df, quarantine=True).collect()}
    for doc, rec in ((1, ima_rec), (2, ms_rec), (3, qt_rec)):
        r = got[doc]
        assert r["error"] is None
        assert r["n_frames"] == len(rec) and r["n_channels"] == 2
    assert got[4]["error"].startswith("malformed:")


# ------------------------------------------------ hypothesis property


try:
    from hypothesis import given, settings
    from hypothesis import strategies as hst
    from hypothesis.extra.numpy import arrays

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:

    @given(
        wave=arrays(
            np.int16,
            hst.tuples(
                hst.integers(min_value=1, max_value=120),
                hst.integers(min_value=1, max_value=3),
            ),
            elements=hst.integers(min_value=-32768, max_value=32767),
        ),
        groups=hst.integers(min_value=1, max_value=3),
    )
    @settings(max_examples=25, deadline=None)
    def test_property_ima_wav_decode_equals_scalar_reconstruction(wave, groups):
        """For ANY int16 waveform (any length/channel count, any
        block size), the vectorized decoder must equal the scalar
        encoder's own reconstruction exactly — the shrinking version
        of the seeded round-trip pins."""
        payload, recon = _ima_wav_bytes(wave, 8000, groups=groups)
        got, rate = decode_audio(payload)
        assert rate == 8000
        np.testing.assert_array_equal(got, recon)

    @given(
        wave=arrays(
            np.int16,
            hst.tuples(
                hst.integers(min_value=2, max_value=100),
                hst.integers(min_value=1, max_value=2),
            ),
            elements=hst.integers(min_value=-32768, max_value=32767),
        ),
        bpred=hst.integers(min_value=0, max_value=6),
    )
    @settings(max_examples=25, deadline=None)
    def test_property_ms_wav_decode_equals_scalar_reconstruction(wave, bpred):
        payload, recon = _ms_wav_bytes(wave, 8000, bpred=bpred)
        got, _ = decode_audio(payload)
        np.testing.assert_array_equal(got, recon)

    @given(
        wave=arrays(
            np.int16,
            hst.tuples(
                hst.integers(min_value=1, max_value=200),
                hst.integers(min_value=1, max_value=2),
            ),
            elements=hst.integers(min_value=-32768, max_value=32767),
        ),
    )
    @settings(max_examples=20, deadline=None)
    def test_property_ima4_decode_equals_scalar_reconstruction(wave):
        payload, recon = _ima4_bytes(wave, 22050)
        got, rate = decode_audio(payload)
        assert rate == 22050
        np.testing.assert_array_equal(got, recon)


def _rebuild_wav_data(payload: bytes, new_data: bytes, drop_fact: bool = False):
    """Re-assemble a WAV keeping the original fmt (and fact unless
    dropped) chunks but swapping the data chunk body."""
    doff = payload.find(b"data")
    chunks = payload[12:doff]
    if drop_fact:
        foff = chunks.find(b"fact")
        fsz = struct.unpack_from("<I", chunks, foff + 4)[0]
        chunks = chunks[:foff] + chunks[foff + 8 + fsz + (fsz & 1):]
    chunks += b"data" + struct.pack("<I", len(new_data)) + new_data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_ima_wav_partial_final_block_with_fact():
    """A SHORT final block (full header + whole nibble groups) decodes
    when the fact chunk bounds the frame count — how ffmpeg ships
    streams whose length isn't a block multiple. 43 mono frames at
    spb=17 (block_align 12): blocks 1-2 full, block 3 carries header
    (1 sample) + ONE 4-byte group (8 samples) = exactly the 9 real
    tail frames."""
    x = _smooth(932, 43, 1)
    payload, recon = _ima_wav_bytes(x, 8000, groups=2)  # spb=17, 3 blocks
    doff = payload.find(b"data")
    data = payload[doff + 8:]
    assert len(data) == 36
    trimmed = _rebuild_wav_data(payload, data[:32])  # drop block 3 group 2
    got, rate = decode_audio(trimmed)
    assert rate == 8000
    assert got.shape == (43, 1)
    np.testing.assert_array_equal(got, recon)


def test_ms_wav_partial_final_block_with_fact():
    """MS ADPCM twin: 52 mono frames at spb=32 (block_align 22);
    block 2 trimmed to header (2 samples) + 9 nibble bytes (18
    nibbles) = exactly the 20 real tail frames."""
    x = _smooth(933, 52, 1)
    payload, recon = _ms_wav_bytes(x, 8000)
    doff = payload.find(b"data")
    data = payload[doff + 8:]
    assert len(data) == 44
    trimmed = _rebuild_wav_data(payload, data[:38])
    got, _ = decode_audio(trimmed)
    assert got.shape == (52, 1)
    np.testing.assert_array_equal(got, recon)


def test_ima_wav_partial_final_block_rejections():
    x = _smooth(934, 43, 1)
    payload, _ = _ima_wav_bytes(x, 8000, groups=2)
    doff = payload.find(b"data")
    data = payload[doff + 8:]
    # no fact chunk: a partial block is indistinguishable from a cut
    # stream — stays malformed, and the message says why
    nofact = _rebuild_wav_data(payload, data[:32], drop_fact=True)
    with pytest.raises(ValueError, match="no fact chunk"):
        decode_audio(nofact)
    # fact exceeding what the partial tail holds (full 34 + tail 9 = 43)
    over = bytearray(_rebuild_wav_data(payload, data[:32]))
    struct.pack_into("<I", over, over.find(b"fact") + 8, 44)
    with pytest.raises(ValueError, match="final block partial"):
        decode_audio(bytes(over))
    # tail not a header + whole nibble groups
    ragged = _rebuild_wav_data(payload, data[:30])
    with pytest.raises(ValueError, match="whole nibble groups"):
        decode_audio(ragged)
    # tail shorter than the state header
    tiny = _rebuild_wav_data(payload, data[:26])
    with pytest.raises(ValueError, match="whole nibble groups|state"):
        decode_audio(tiny)


def test_ima_wav_long_stream_vectorized_path_equals_scalar_pin():
    """Streams above the scalar fast-path cutoff (nibbles.size >
    4096) take the numpy lockstep path; both paths must compute the
    identical recurrence. 5000 mono frames at spb=17 → 295 blocks ×
    16 nibbles = 4720 > 4096."""
    x = _smooth(935, 5000, 1, amp=28000)
    payload, recon = _ima_wav_bytes(x, 8000, groups=2)
    got, _ = decode_audio(payload)
    assert got.shape == (5000, 1)
    np.testing.assert_array_equal(got, recon)
