"""Multimodal audio lane: real WAV decode + frame-energy features.

Same verification pattern as the round-5 image codec
(``queries/multimodal.py``): PCM fixtures are synthesized
deterministically from the document text bytes, encoded into REAL RIFF
PCM16 WAV containers (with a JUNK chunk so chunk skipping is exercised),
then decoded by ``operators/audiocodec.py`` — and the oracle recomputes
every decoded sample with pure integer SQL, so the driver hash-verifies
the container walk and PCM extraction end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.audiocodec import decode_wav, encode_wav, synth_samples
from ..tables import tables
from .registry import query

FRAME = 160  # PCM frames per analysis frame (20 ms at 8 kHz)

# Oracle-side definition of the synthesized audio — must mirror
# operators/audiocodec.py:synth_samples exactly. j enumerates interleaved
# int16 samples; fixtures are ASCII so ascii(char) == byte.
_SAMPLE_CTE = """
    WITH params AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             400 + 40 * (doc_id % 11) AS nf,
             1 + doc_id % 2 AS c,
             8000 * (1 + doc_id % 3) AS rate
      FROM documents WHERE doc_id % {modulus} = 0
    ), smp AS (
      SELECT doc_id, nf, c, rate,
             unnest(range(0, nf * c)) AS j,
             (ascii(substring(text, CAST(j % n AS INT) + 1, 1)) - 128) * 256 AS v
      FROM params
    )
"""


def wav_files_df(spark: SparkSession, sf_dir: str, modulus: int) -> DataFrame:
    """Shared fixture stage: synthesize a real PCM16 WAV per document
    (JUNK chunk inserted so the decoder's chunk skipping is on the
    verified path). Fanned across executor slots like the PNG stage —
    codec cost is the wall-clock and the scan arrives as one file."""
    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % modulus == 0)
    binary_df = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    # plan-time fan-out decision (no .rdd probe) — see multimodal.py
    from ..operators.ranks import cpu_fanout

    binary_df = cpu_fanout(binary_df)

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            wavs = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                did = int(did)
                samples, rate = synth_samples(bytes(p), did)
                junk = b"j" * (7 + did % 5)  # odd sizes hit the pad rule
                wavs.append(encode_wav(samples, rate, junk_chunk=junk))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "wav": wavs})

    return binary_df.mapInPandas(encode_batches, schema="doc_id long, wav binary")


@query(
    "q_audio_decode",
    oracle=_SAMPLE_CTE.format(modulus=13)
    + """
    SELECT doc_id,
           CAST(rate AS INT) AS sample_rate,
           CAST(c AS INT) AS n_channels,
           CAST(nf AS INT) AS n_frames,
           CAST(SUM(v) AS BIGINT) AS sample_sum,
           CAST(SUM((j % 251 + 1) * v) AS BIGINT) AS sample_wsum,
           CAST(MAX(abs(v)) AS INT) AS peak_abs
    FROM smp
    GROUP BY doc_id, rate, c, nf
    """,
    tags=("multimodal", "audio", "mapInPandas", "llm-data"),
)
def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: WAV binary column in -> PCM metadata + exact
    sample statistics out, via Arrow-batched mapInPandas over the
    pure-stdlib RIFF/PCM16 decoder (operators/audiocodec.py).

    The oracle recomputes the same int16 samples with integer SQL, so
    the driver hash gate verifies container parsing (sizes, padding,
    JUNK skipping), fmt consistency, and interleaved PCM extraction —
    a wrong stride or a swallowed pad byte shifts every sample and
    fails the hash.
    """
    wavs = wav_files_df(spark, sf_dir, modulus=13)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id",
                    "sample_rate",
                    "n_channels",
                    "n_frames",
                    "sample_sum",
                    "sample_wsum",
                    "peak_abs",
                )
            }
            for did, wav in zip(pdf["doc_id"], pdf["wav"]):
                samples, rate = decode_wav(bytes(wav))
                flat = samples.reshape(-1).astype(np.int64)
                j = np.arange(flat.size, dtype=np.int64)
                out["doc_id"].append(int(did))
                out["sample_rate"].append(rate)
                out["n_channels"].append(samples.shape[1])
                out["n_frames"].append(samples.shape[0])
                out["sample_sum"].append(int(flat.sum()))
                out["sample_wsum"].append(int(((j % 251 + 1) * flat).sum()))
                out["peak_abs"].append(int(np.abs(flat).max()))
            yield pd.DataFrame(out)

    return wavs.mapInPandas(
        decode_batches,
        schema=(
            "doc_id long, sample_rate int, n_channels int, n_frames int, "
            "sample_sum long, sample_wsum long, peak_abs int"
        ),
    )


@query(
    "q_audio_frame_energy",
    oracle=_SAMPLE_CTE.format(modulus=21)
    + f"""
    SELECT doc_id,
           CAST((j // c) // {FRAME} AS INT) AS frame_idx,
           CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy,
           CAST(MAX(abs(v)) AS INT) AS peak_abs
    FROM smp
    WHERE (j // c) < (nf // {FRAME}) * {FRAME}
    GROUP BY doc_id, (j // c) // {FRAME}
    """,
    tags=("multimodal", "audio", "features", "llm-data"),
)
def q_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: per-frame energy (sum of squared
    samples over {FRAME}-frame windows, all channels) + per-frame peak —
    the front half of a VAD/segmentation stage, 1→N rows per clip.

    Complete frames only (the ragged tail is cropped, like the image
    box-resize), keeping the math integer-exact and the oracle
    SQL-expressible. Decode runs once per clip in the same Arrow batch
    as the feature math; only (doc_id, frame_idx, ints) leave Python.
    """
    wavs = wav_files_df(spark, sf_dir, modulus=21)

    def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {
                k: [] for k in ("doc_id", "frame_idx", "energy", "peak_abs")
            }
            for did, wav in zip(pdf["doc_id"], pdf["wav"]):
                samples, _rate = decode_wav(bytes(wav))
                nf, c = samples.shape
                k = nf // FRAME
                block = samples[: k * FRAME, :].astype(np.int64).reshape(k, FRAME, c)
                energy = (block * block).sum(axis=(1, 2))
                peak = np.abs(block).reshape(k, -1).max(axis=1)
                out["doc_id"].extend([int(did)] * k)
                out["frame_idx"].extend(range(k))
                out["energy"].extend(int(e) for e in energy)
                out["peak_abs"].extend(int(p) for p in peak)
            yield pd.DataFrame(out)

    return wavs.mapInPandas(
        energy_batches,
        schema="doc_id long, frame_idx int, energy long, peak_abs int",
    )


@query(
    "q_audio_mixdown_decimate",
    oracle=_SAMPLE_CTE.format(modulus=13)
    + """,
    mono AS (
      SELECT doc_id, CAST(j // c AS BIGINT) AS f,
             CAST(floor(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
      FROM smp GROUP BY doc_id, j // c
    ),
    dec AS (
      SELECT doc_id, f // 2 AS fo, m FROM mono WHERE f % 2 = 0
    )
    SELECT doc_id,
           COUNT(*) AS n_out_frames,
           CAST(SUM(m) AS BIGINT) AS out_sum,
           CAST(SUM((fo % 251 + 1) * m) AS BIGINT) AS out_wsum
    FROM dec GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "augmentation", "llm-data"),
)
def q_audio_mixdown_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio TRANSFORM stage: decode the WAV, mix interleaved channels
    down to mono (floor of the channel mean — negative PCM values make
    floor-vs-truncate a real cross-engine trap, so floor() over one
    exact double division is pinned on both sides), then decimate 2x
    (keep even frames). Exact integer checksums of the output signal —
    a wrong channel de-interleave, mean, or phase slips the hash.

    This is the map-side preprocessing shape of a speech-training
    pipeline (mixdown -> resample -> feature extraction); like the image
    augment stage it is embarrassingly parallel over Arrow batches."""
    wavs = wav_files_df(spark, sf_dir, modulus=13)

    def mix_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {
                k: [] for k in ("doc_id", "n_out_frames", "out_sum", "out_wsum")
            }
            for did, wav in zip(pdf["doc_id"], pdf["wav"]):
                samples, _rate = decode_wav(bytes(wav))
                mono = np.floor(
                    samples.astype(np.float64).sum(axis=1) / samples.shape[1]
                ).astype(np.int64)
                dec = mono[::2]
                fo = np.arange(dec.size, dtype=np.int64)
                out["doc_id"].append(int(did))
                out["n_out_frames"].append(int(dec.size))
                out["out_sum"].append(int(dec.sum()))
                out["out_wsum"].append(int(((fo % 251 + 1) * dec).sum()))
            yield pd.DataFrame(out)

    return wavs.mapInPandas(
        mix_batches,
        schema="doc_id long, n_out_frames long, out_sum bigint, out_wsum bigint",
    )
