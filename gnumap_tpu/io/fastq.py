"""Read I/O: FASTA / FASTQ / Illumina ``_prb.txt``/``_int.txt`` parsing and
fixed-shape device batching.

TPU-native replacement for the reference's ``SeqReader``/``SeqManager``
thread pool (SURVEY.md §1 L2 [REPO?]): instead of mutex-guarded read handout
to pthreads, a streaming parser yields **fixed-shape padded batches**
(compile-once static shapes) that are double-buffered to the device by the
pipeline.  A C++ fast path for parsing lives in gnumap_tpu/native (optional;
this file is the always-available implementation).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Tuple

import numpy as np

from gnumap_tpu.config import MapperConfig
from gnumap_tpu.core import packing, pwm as pwm_mod


def read_fasta(path: str) -> List[Tuple[str, str]]:
    contigs: List[Tuple[str, str]] = []
    name, parts = None, []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    contigs.append((name, "".join(parts)))
                name, parts = line[1:].split()[0], []
            else:
                parts.append(line)
    if name is not None:
        contigs.append((name, "".join(parts)))
    return contigs


@dataclasses.dataclass
class ReadRecord:
    name: str
    codes: np.ndarray        # int8[L]
    pwm_q: np.ndarray        # int32[L, 4] quantized probability rows
    quals: np.ndarray        # int16[L] Phred values (for SAM round-trip)


def iter_fastq(path: str, cfg: MapperConfig) -> Iterator[ReadRecord]:
    with open(path) as f:
        while True:
            hdr = f.readline()
            if not hdr:
                return
            seq = f.readline().strip()
            f.readline()                      # '+'
            qual = f.readline().strip()
            codes = packing.encode(seq)
            q = np.frombuffer(qual.encode(), dtype=np.uint8).astype(
                np.int32) - cfg.phred_offset
            yield ReadRecord(hdr[1:].strip().split()[0], codes,
                             pwm_mod.pwm_from_calls(codes, q),
                             q.astype(np.int16))


def iter_fasta_reads(path: str, cfg: MapperConfig,
                     default_qual: int = 30) -> Iterator[ReadRecord]:
    """FASTA reads get a flat default quality (reference accepts FASTA input)."""
    for name, seq in read_fasta(path):
        codes = packing.encode(seq)
        q = np.full(len(codes), default_qual, dtype=np.int32)
        yield ReadRecord(name, codes, pwm_mod.pwm_from_calls(codes, q),
                         q.astype(np.int16))


def iter_prb(path: str, cfg: MapperConfig) -> Iterator[ReadRecord]:
    """Illumina ``_prb.txt``: per base, 4 whitespace-separated values per
    position (positions separated by tabs).  Values may be log-odds-like
    integers or raw intensities; rows are shifted positive and renormalized
    (reference ``centers.h`` quantization analog [REPO?])."""
    with open(path) as f:
        for ln, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            groups = [g for g in line.split("\t") if g.strip()]
            rows = np.array([[float(v) for v in g.split()] for g in groups])
            if rows.shape[-1] != 4:
                raise ValueError(f"{path}:{ln+1}: expected 4 values per base")
            rows = rows - rows.min(axis=-1, keepdims=True)
            codes = np.argmax(rows, axis=-1).astype(np.int8)
            pq = pwm_mod.pwm_from_probs(rows)
            # synthesize Phred from the max probability for SAM round-trip
            pmax = pq.max(axis=-1) / 4096.0
            q = np.clip(np.round(-10.0 * np.log10(np.maximum(1e-6, 1.0 - pmax))),
                        2, 60).astype(np.int16)
            yield ReadRecord(f"prb_{ln}", codes, pq, q)


@dataclasses.dataclass
class ReadBatch:
    """Fixed-shape padded batch: the device-facing unit of work."""
    names: List[str]
    codes: np.ndarray        # int8[B, Lmax], pad = N
    pwm_q: np.ndarray        # int32[B, Lmax, 4], pad rows are all-zero
    lens: np.ndarray         # int32[B], 0 for pad reads
    quals: np.ndarray        # int16[B, Lmax] Phred (0 pad)
    n: int                   # actual number of reads (<= B)


def batch_reads(reads: Iterator[ReadRecord], cfg: MapperConfig
                ) -> Iterator[ReadBatch]:
    """Group a read stream into fixed (batch_size, max_read_len) batches.

    Pad positions get all-zero PWM rows (emission contributes exactly 0, so
    scores are invariant to padding — frozen property, tested).  Reads longer
    than max_read_len are truncated (reference reads are fixed-length;
    truncation is logged by the caller).
    """
    B, L = cfg.batch_size, cfg.max_read_len
    buf: List[ReadRecord] = []

    def flush() -> ReadBatch:
        codes = np.full((B, L), 4, dtype=np.int8)
        pw = np.zeros((B, L, 4), dtype=np.int32)
        lens = np.zeros(B, dtype=np.int32)
        quals = np.zeros((B, L), dtype=np.int16)
        names = []
        for i, r in enumerate(buf):
            n = min(len(r.codes), L)
            codes[i, :n] = r.codes[:n]
            pw[i, :n] = r.pwm_q[:n]
            quals[i, :n] = r.quals[:n]
            lens[i] = n
            names.append(r.name)
        return ReadBatch(names, codes, pw, lens, quals, len(buf))

    for r in reads:
        buf.append(r)
        if len(buf) == B:
            yield flush()
            buf = []
    if buf:
        yield flush()
