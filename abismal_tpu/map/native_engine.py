"""Python driver for the native batched mapping engine (_engine.cpp).

The native library implements the complete per-read decide/align/format
stage (candidate heaps, banded alignment, PE mating, SAM records, stats)
plus a full native seeding path, multithreaded over the reads of a batch
with read-order output (deterministic at any thread count).  This class
feeds it read batches and, optionally, device stage-1 event streams; the
companion `TpuNativeEngine` in pipeline.py supplies those events from the
accelerator.

Semantics are identical to the Python `MappingEngine` oracle (engine.py),
which is parity-validated byte-for-byte against the reference
(src/abismal.cpp:1435-2185)."""

from __future__ import annotations

import ctypes

import numpy as np

from ..constants import (
    PE_MAX_DIST_DEFAULT,
    PE_MIN_DIST_DEFAULT,
    VALID_FRAC_DEFAULT,
)
from ..io.fastq import ReadLoader
from ..io.sam import make_sam_header
from .stats import PEStats, SEStats

_SE_FIELDS = ("total_reads", "reads_mapped_unique", "reads_mapped_ambiguous",
              "reads_skipped", "edit_distance", "total_bases")


def _blob(items):
    """list of bytes -> (blob ascii array, int64 offsets)."""
    offs = np.zeros(len(items) + 1, dtype=np.int64)
    for i, it in enumerate(items):
        offs[i + 1] = offs[i] + len(it)
    blob = np.frombuffer(b"".join(items), dtype=np.uint8)
    if blob.size == 0:
        blob = np.zeros(1, dtype=np.uint8)
    return blob, offs


def _ptr(a):
    return a.ctypes.data if a is not None else None


class NativeMappingEngine:
    """Drop-in engine for run_map: map_se_reads / map_pe_reads over the
    native library, with internal threading (`n_threads`)."""

    supports_pipeline = True

    def __init__(self, index, allow_ambig=False,
                 valid_frac=VALID_FRAC_DEFAULT,
                 pe_min_dist=PE_MIN_DIST_DEFAULT,
                 pe_max_dist=PE_MAX_DIST_DEFAULT, n_threads: int = 1):
        from ..native import get_engine_lib
        from ..utils.dna import unpack_nibbles_u64

        self.lib = get_engine_lib()
        self.index = index
        self.cl = index.cl
        self.n_threads = max(1, n_threads)
        self.allow_ambig = allow_ambig
        self.pe_min_dist = int(pe_min_dist)
        self.pe_max_dist = int(pe_max_dist)
        # pinned arrays: the native context aliases their memory
        self._nib = np.ascontiguousarray(
            unpack_nibbles_u64(index.genome_words, index.genome_size))
        self._words = np.ascontiguousarray(index.genome_words,
                                           dtype=np.uint64)
        self._c2 = np.ascontiguousarray(index.counter, dtype=np.uint32)
        self._ct = np.ascontiguousarray(index.counter_t, dtype=np.uint32)
        self._ca = np.ascontiguousarray(index.counter_a, dtype=np.uint32)
        self._i2 = np.ascontiguousarray(index.index, dtype=np.uint32)
        self._it = np.ascontiguousarray(index.index_t, dtype=np.uint32)
        self._ia = np.ascontiguousarray(index.index_a, dtype=np.uint32)
        self._starts = np.ascontiguousarray(index.cl.starts, dtype=np.uint64)
        names_blob = "\n".join(index.cl.names).encode()
        self._ctx = self.lib.engine_create(
            _ptr(self._nib), _ptr(self._words), int(index.genome_size),
            _ptr(self._c2), _ptr(self._ct), _ptr(self._ca),
            _ptr(self._i2), _ptr(self._it), _ptr(self._ia),
            int(index.max_candidates),
            _ptr(self._starts), len(index.cl.names), names_blob,
            int(allow_ambig), float(valid_frac), int(pe_min_dist),
            int(pe_max_dist),
        )

    def __del__(self):
        ctx = getattr(self, "_ctx", None)
        if ctx:
            self.lib.engine_destroy(ctx)
            self._ctx = None

    @property
    def n_device_mated(self) -> int:
        """Orientations whose mating decision came from the device-resident
        sweep (apply_device_mate; tns slot 14)."""
        ns = np.zeros(16, dtype=np.int64)
        self.lib.engine_stage_ns(self._ctx, _ptr(ns), 0)
        return int(ns[14])

    # ---- event plumbing (None for the pure-native engine) -----------------
    def _event_args(self, events):
        if events is None:
            return (None, None, None, None, None, 0)
        ev_pos, ev_diffs, ev_rank, start, count, boundary = events
        return (_ptr(ev_pos), _ptr(ev_diffs), _ptr(ev_rank), _ptr(start),
                _ptr(count), int(boundary))

    # ---- batch calls -------------------------------------------------------
    def _call_se(self, reads, a_rich_mode, random_pbat, stats, out, events):
        names, seqs = zip(*reads) if reads else ((), ())
        rblob, roffs = _blob(list(seqs))
        nblob, noffs = _blob([n.encode() for n in names])
        st = np.zeros(6, dtype=np.int64)
        n = self.lib.engine_map_se_batch(
            self._ctx, _ptr(rblob), _ptr(roffs), _ptr(nblob), _ptr(noffs),
            len(reads), int(a_rich_mode), int(random_pbat),
            *self._event_args(events), self.n_threads, _ptr(st))
        out.write(ctypes.string_at(self.lib.engine_out_ptr(self._ctx),
                                   n).decode())
        for i, f in enumerate(_SE_FIELDS):
            setattr(stats, f, getattr(stats, f) + int(st[i]))

    def _call_pe(self, reads1, reads2, a_rich_mode, random_pbat, stats, out,
                 events):
        if len(reads1) != len(reads2):
            raise RuntimeError(
                f"paired-end batch sizes differ. Batch 1: {len(reads1)}, "
                f"batch 2: {len(reads2)}. Are you sure your paired-end "
                "inputs have the same number of reads?")
        n1, s1 = zip(*reads1) if reads1 else ((), ())
        n2, s2 = zip(*reads2) if reads2 else ((), ())
        r1b, r1o = _blob(list(s1))
        n1b, n1o = _blob([n.encode() for n in n1])
        r2b, r2o = _blob(list(s2))
        n2b, n2o = _blob([n.encode() for n in n2])
        st = np.zeros(18, dtype=np.int64)
        n = self.lib.engine_map_pe_batch(
            self._ctx, _ptr(r1b), _ptr(r1o), _ptr(n1b), _ptr(n1o),
            _ptr(r2b), _ptr(r2o), _ptr(n2b), _ptr(n2o),
            len(reads1), int(a_rich_mode), int(random_pbat),
            *self._event_args(events), self.n_threads, _ptr(st))
        out.write(ctypes.string_at(self.lib.engine_out_ptr(self._ctx),
                                   n).decode())
        for blk, dst in enumerate((stats.read_pair_stats, stats.end1_stats,
                                   stats.end2_stats)):
            for i, f in enumerate(_SE_FIELDS):
                setattr(dst, f, getattr(dst, f) + int(st[6 * blk + i]))

    def _call_pe_slots(self, reads1, reads2, a_rich_mode, random_pbat,
                       stats, out, sl_pos, sl_ds, sl_cnt, mate=None):
        """PE finalize from device stage-1+2 candidate slots (pipeline.py
        build_stage12pe): per-unit prescored candidate lists replace the
        event stream and the host score pass; units with cnt < 0 re-seed
        natively (byte-identical at any fallback rate)."""
        if len(reads1) != len(reads2):
            raise RuntimeError(
                f"paired-end batch sizes differ. Batch 1: {len(reads1)}, "
                f"Batch 2: {len(reads2)}. Are you sure your paired-end "
                "inputs have the same number of reads?")
        n1, s1 = zip(*reads1) if reads1 else ((), ())
        n2, s2 = zip(*reads2) if reads2 else ((), ())
        r1b, r1o = _blob(list(s1))
        n1b, n1o = _blob([n.encode() for n in n1])
        r2b, r2o = _blob(list(s2))
        n2b, n2o = _blob([n.encode() for n in n2])
        sl_pos = np.ascontiguousarray(sl_pos, dtype=np.uint32)
        sl_ds = np.ascontiguousarray(sl_ds, dtype=np.int32)
        sl_cnt = np.ascontiguousarray(sl_cnt, dtype=np.int32)
        if mate is not None:
            mate = np.ascontiguousarray(mate, dtype=np.int32)
        st = np.zeros(18, dtype=np.int64)
        n = self.lib.engine_map_pe_batch_slots(
            self._ctx, _ptr(r1b), _ptr(r1o), _ptr(n1b), _ptr(n1o),
            _ptr(r2b), _ptr(r2o), _ptr(n2b), _ptr(n2o),
            len(reads1), int(a_rich_mode), int(random_pbat),
            _ptr(sl_pos), _ptr(sl_ds), _ptr(sl_cnt), sl_pos.shape[1],
            _ptr(mate) if mate is not None else None,
            mate.shape[1] if mate is not None else 0,
            self.n_threads, _ptr(st))
        out.write(ctypes.string_at(self.lib.engine_out_ptr(self._ctx),
                                   n).decode())
        for blk, dst in enumerate((stats.read_pair_stats, stats.end1_stats,
                                   stats.end2_stats)):
            for i, f in enumerate(_SE_FIELDS):
                setattr(dst, f, getattr(dst, f) + int(st[6 * blk + i]))

    # ---- device stage-2 finalize (pipeline.py build_stage12) ---------------
    def _finalize_se(self, reads, a_rich_mode, random_pbat, records, stats,
                     out, cig_ops=None, cig_meta=None):
        """records: (n_reads, 4) int32 per-read device decisions; the
        native side does traceback-for-winners + SAM + stats, or a full
        exact re-map for REC_FALLBACK rows.  cig_ops/cig_meta (optional):
        device-traceback output (pipeline.build_tb_block) -- aligned rows
        with meta n_ops >= 0 skip the host aligner entirely."""
        names, seqs = zip(*reads) if reads else ((), ())
        rblob, roffs = _blob(list(seqs))
        nblob, noffs = _blob([n.encode() for n in names])
        records = np.ascontiguousarray(records, dtype=np.int32)
        tb_nops = 0
        if cig_ops is not None:
            cig_ops = np.ascontiguousarray(cig_ops, dtype=np.int32)
            cig_meta = np.ascontiguousarray(cig_meta, dtype=np.int32)
            tb_nops = cig_ops.shape[1]
        st = np.zeros(6, dtype=np.int64)
        n = self.lib.engine_se_finalize(
            self._ctx, _ptr(rblob), _ptr(roffs), _ptr(nblob), _ptr(noffs),
            len(reads), int(a_rich_mode), int(random_pbat), _ptr(records),
            _ptr(cig_ops) if cig_ops is not None else None,
            _ptr(cig_meta) if cig_meta is not None else None, tb_nops,
            self.n_threads, _ptr(st))
        out.write(ctypes.string_at(self.lib.engine_out_ptr(self._ctx),
                                   n).decode())
        for i, f in enumerate(_SE_FIELDS):
            setattr(stats, f, getattr(stats, f) + int(st[i]))

    # ---- two-phase SE interface for device-side batched alignment ---------
    def _phase1_se(self, reads, a_rich_mode, random_pbat, events):
        """Seeds the batch and emits alignment jobs; returns (n_jobs, jobs)
        where jobs is int32 (n_jobs, 5): read, enc_sel, pos, bw, qsz.  The
        input blobs are pinned on self until _phase2_se runs."""
        names, seqs = zip(*reads) if reads else ((), ())
        rblob, roffs = _blob(list(seqs))
        nblob, noffs = _blob([n.encode() for n in names])
        self._phase_refs = (rblob, roffs, nblob, noffs, events)
        n_jobs = self.lib.engine_se_phase1(
            self._ctx, _ptr(rblob), _ptr(roffs), _ptr(nblob), _ptr(noffs),
            len(reads), int(a_rich_mode), int(random_pbat),
            *self._event_args(events), self.n_threads)
        jobs = np.zeros((0, 5), dtype=np.int32)
        if n_jobs:
            ptr = self.lib.engine_jobs_ptr(self._ctx)
            jobs = np.ctypeslib.as_array(
                ctypes.cast(ptr, ctypes.POINTER(ctypes.c_int32)),
                shape=(int(n_jobs), 5)).copy()
        return int(n_jobs), jobs

    def _phase2_se(self, scores, stats, out):
        st = np.zeros(6, dtype=np.int64)
        scores = np.ascontiguousarray(scores, dtype=np.int32)
        n = self.lib.engine_se_phase2(self._ctx, _ptr(scores),
                                      self.n_threads, _ptr(st))
        out.write(ctypes.string_at(self.lib.engine_out_ptr(self._ctx),
                                   n).decode())
        for i, f in enumerate(_SE_FIELDS):
            setattr(stats, f, getattr(stats, f) + int(st[i]))
        self._phase_refs = None

    # ---- two-phase PE interface for device-side batched alignment ---------
    def _phase1_pe(self, reads1, reads2, a_rich_mode, random_pbat, events):
        """Seeds every fragment configuration of the batch and emits
        alignment jobs (read, unit_offset, pos, bw, qsz); pins the input
        blobs on self until _phase2_pe runs."""
        if len(reads1) != len(reads2):
            raise RuntimeError(
                f"paired-end batch sizes differ. Batch 1: {len(reads1)}, "
                f"Batch 2: {len(reads2)}. Are you sure your paired-end "
                "inputs have the same number of reads?")
        n1, s1 = zip(*reads1) if reads1 else ((), ())
        n2, s2 = zip(*reads2) if reads2 else ((), ())
        r1b, r1o = _blob(list(s1))
        n1b, n1o = _blob([n.encode() for n in n1])
        r2b, r2o = _blob(list(s2))
        n2b, n2o = _blob([n.encode() for n in n2])
        self._phase_refs = (r1b, r1o, n1b, n1o, r2b, r2o, n2b, n2o, events)
        n_jobs = self.lib.engine_pe_phase1(
            self._ctx, _ptr(r1b), _ptr(r1o), _ptr(n1b), _ptr(n1o),
            _ptr(r2b), _ptr(r2o), _ptr(n2b), _ptr(n2o),
            len(reads1), int(a_rich_mode), int(random_pbat),
            *self._event_args(events), self.n_threads)
        jobs = np.zeros((0, 5), dtype=np.int32)
        if n_jobs:
            ptr = self.lib.engine_pe_jobs_ptr(self._ctx)
            jobs = np.ctypeslib.as_array(
                ctypes.cast(ptr, ctypes.POINTER(ctypes.c_int32)),
                shape=(int(n_jobs), 5)).copy()
        return int(n_jobs), jobs

    def _phase2_pe(self, scores, stats, out):
        st = np.zeros(18, dtype=np.int64)
        scores = np.ascontiguousarray(scores, dtype=np.int32)
        n = self.lib.engine_pe_phase2(self._ctx, _ptr(scores),
                                      self.n_threads, _ptr(st))
        out.write(ctypes.string_at(self.lib.engine_out_ptr(self._ctx),
                                   n).decode())
        for blk, dst in enumerate((stats.read_pair_stats, stats.end1_stats,
                                   stats.end2_stats)):
            for i, f in enumerate(_SE_FIELDS):
                setattr(dst, f, getattr(dst, f) + int(st[6 * blk + i]))
        self._phase_refs = None

    # ---- fully-native streaming loop (engine_run_se/pe) --------------------
    # FASTQ parse, mapping threads, and ordered SAM writing all run inside
    # the native library; no Python executes per read.  Only usable for
    # SAM-text output (BAM goes through the Python BGZF writer).
    supports_streaming = True

    def run_streaming(self, reads_file1, reads_file2, out_path, header: str,
                      a_rich_mode, random_pbat, stats, batch_size=1000,
                      verbose=False, skip_reads=0, max_reads=-1, bam=False):
        if bam:
            # native BAM: pass the uncompressed BAM header payload; the
            # library BGZF-compresses it and emits binary records
            from ..io.bam import bam_header_payload

            hdr = bam_header_payload(header)
        else:
            hdr = header.encode()
        if reads_file2 is None:
            st = np.zeros(6, dtype=np.int64)
            n = self.lib.engine_run_se(
                self._ctx, reads_file1.encode(), out_path.encode(), hdr,
                len(hdr), int(a_rich_mode), int(random_pbat),
                int(batch_size), self.n_threads, _ptr(st), int(verbose),
                int(skip_reads), int(max_reads), int(bam))
            if n < 0:
                raise RuntimeError(
                    self.lib.engine_error_ptr(self._ctx).decode())
            for i, f in enumerate(_SE_FIELDS):
                setattr(stats, f, getattr(stats, f) + int(st[i]))
        else:
            st = np.zeros(18, dtype=np.int64)
            n = self.lib.engine_run_pe(
                self._ctx, reads_file1.encode(), reads_file2.encode(),
                out_path.encode(), hdr, len(hdr), int(a_rich_mode),
                int(random_pbat), int(batch_size), self.n_threads, _ptr(st),
                int(verbose), int(skip_reads), int(max_reads), int(bam))
            if n < 0:
                raise RuntimeError(
                    self.lib.engine_error_ptr(self._ctx).decode())
            for blk, dst in enumerate((stats.read_pair_stats,
                                       stats.end1_stats, stats.end2_stats)):
                for i, f in enumerate(_SE_FIELDS):
                    setattr(dst, f, getattr(dst, f) + int(st[6 * blk + i]))
        return int(n)

    # ---- pipelined interface (dispatch/finish; no-op split here) -----------
    def dispatch_se(self, reads, a_rich_mode, random_pbat):
        return (reads, a_rich_mode, random_pbat, None)

    def finish_se(self, handle, stats, out):
        reads, arm, rp, events = handle
        self._call_se(reads, arm, rp, stats, out, events)
        return len(reads)

    def dispatch_pe(self, reads1, reads2, a_rich_mode, random_pbat):
        return (reads1, reads2, a_rich_mode, random_pbat, None)

    def finish_pe(self, handle, stats, out):
        reads1, reads2, arm, rp, events = handle
        self._call_pe(reads1, reads2, arm, rp, stats, out, events)
        return len(reads1)

    # ---- MappingEngine-compatible entry points -----------------------------
    def map_se_reads(self, reads, a_rich_mode, random_pbat, stats, out):
        self._call_se(reads, a_rich_mode, random_pbat, stats, out, None)

    def map_pe_reads(self, reads1, reads2, a_rich_mode, random_pbat, stats,
                     out):
        self._call_pe(reads1, reads2, a_rich_mode, random_pbat, stats, out,
                      None)


def run_map_pipelined(engine, index, reads_file1, reads_file2, out_path,
                      command_line, a_rich=False, pbat=False,
                      random_pbat=False, bam=False, verbose=False,
                      skip=0, count=None, write_header=True):
    """Batch loop for engines with the dispatch/finish interface: batch k+1's
    device work (if any) is dispatched before batch k is finished, so the
    accelerator overlaps the native decide/align/format stage.

    skip/count restrict the run to the read-range shard [skip, skip+count)
    and write_header=False omits the SAM header (hybrid-split / multi-host
    shard output; the gather step concatenates shards in rank order)."""
    import sys
    import time as _time

    from ..io.sam import open_sam_output

    from collections import deque

    paired = reads_file2 is not None

    # fully-native loop: for SAM-text output from the pure-native engine,
    # the whole read->map->write stream runs inside the C++ library
    if getattr(engine, "supports_streaming", False):
        assert skip == 0 and count is None and write_header, \
            "shard-range options require a dispatch/finish engine"
        import sys as _sys
        import time as _t

        if verbose:
            engine.lib.engine_set_profile(engine._ctx, 1)
        start = _t.monotonic()
        stats = PEStats() if paired else SEStats()
        a_rich_mode = (pbat if paired else (a_rich or pbat))
        engine.run_streaming(
            reads_file1, reads_file2, out_path,
            make_sam_header(index.cl, command_line), a_rich_mode,
            random_pbat, stats, verbose=verbose, bam=bam)
        if verbose:
            total = _t.monotonic() - start
            ns = np.zeros(16, dtype=np.int64)
            engine.lib.engine_stage_ns(engine._ctx, _ptr(ns), 1)
            cpu = max(1, int(ns[:4].sum()))
            for name, v in zip(("seed", "align", "format", "parse"), ns[:4]):
                print(f"[stage {name}: {v / 1e9:.2f}s cpu "
                      f"({100 * int(v) // cpu}%)]", file=_sys.stderr)
            print(f"[total mapping time: {total:.2f}s]", file=_sys.stderr)
        return stats

    depth = max(1, getattr(engine, "pipeline_depth", 1))
    # engines that talk to an accelerator prefer one device call per read
    # batch: the tunnel's per-call latency dominates, so batch size is
    # derived from the engine's unit_batch (reads x units-per-read)
    prb = getattr(engine, "preferred_read_batch", None)
    batch_size = prb(paired, random_pbat) if prb else 1000
    start_time = _time.monotonic()
    n_processed = 0
    bar = None
    if verbose:
        from ..utils.progress import file_progress

        bar = file_progress(reads_file1)
    with open_sam_output(out_path, bam,
                         bam_emit_header=write_header) as out:
        if write_header or bam:
            # BAM sinks always consume the header text: with write_header
            # False it only builds the tid dictionary, emitting nothing
            out.write(make_sam_header(index.cl, command_line))
        if not paired:
            stats = SEStats()
            a_rich_mode = a_rich or pbat
            rl = ReadLoader(reads_file1, batch_size, skip=skip, count=count)
            q = deque()
            while rl:
                batch = rl.load_batch()
                if batch:
                    q.append(engine.dispatch_se(batch, a_rich_mode,
                                                random_pbat))
                while len(q) > (depth if rl else 0):
                    n_processed += engine.finish_se(q.popleft(), stats, out)
                    if bar is not None:
                        b = rl.current_byte
                        if bar.time_to_report(b):
                            bar.report(sys.stderr, b)
                    elif verbose:
                        print(f"[mapped {n_processed} reads]",
                              file=sys.stderr)
            while q:
                n_processed += engine.finish_se(q.popleft(), stats, out)
        else:
            stats = PEStats()
            rl1 = ReadLoader(reads_file1, batch_size, skip=skip, count=count)
            rl2 = ReadLoader(reads_file2, batch_size, skip=skip, count=count)
            q = deque()
            while rl1 and rl2:
                b1 = rl1.load_batch()
                b2 = rl2.load_batch()
                if b1 or b2:
                    # PE ignores -A; conversion mode is pbat only
                    q.append(engine.dispatch_pe(b1, b2, pbat, random_pbat))
                while len(q) > (depth if (rl1 and rl2) else 0):
                    n_processed += engine.finish_pe(q.popleft(), stats, out)
                    if bar is not None:
                        b = rl1.current_byte
                        if bar.time_to_report(b):
                            bar.report(sys.stderr, b)
                    elif verbose:
                        print(f"[mapped {n_processed} read pairs]",
                              file=sys.stderr)
            while q:
                n_processed += engine.finish_pe(q.popleft(), stats, out)

    if bar is not None and bar.prev < 100:
        bar.report(sys.stderr, bar.total)
    if verbose:
        fb = getattr(engine, "n_fallback", None)
        if fb is not None:
            print(f"[device stage-1 fallback units: {fb}/"
                  f"{getattr(engine, 'n_units', 0)}]", file=sys.stderr)
        st = getattr(engine, "stage_time", None)
        if st:
            total = _time.monotonic() - start_time
            for k, v in st.items():
                print(f"[stage {k}: {v:.2f}s ({100 * v / total:.0f}%)]",
                      file=sys.stderr)
        print(f"[total mapping time: "
              f"{_time.monotonic() - start_time:.2f}s]", file=sys.stderr)
    return stats
