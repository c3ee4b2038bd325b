"""abismal-tpu: a TPU-native bisulfite read-mapping engine.

A from-scratch re-design of the abismal WGBS read mapper
(smithlabcode/abismal v3.3.0) for TPU hardware: the hybrid two-letter /
three-letter hash index lives in HBM, read batches are mapped data-parallel
under jit/shard_map, and the hot kernels (bisulfite-aware popcount filter,
banded alignment) run on-device, with host-side Python/C++ for I/O, index
serialization and SAM emission.

Subpackages:
  constants  -- seed / scoring / flag constants (reference parity values)
  utils      -- DNA encodings and small helpers
  io         -- FASTA/FASTQ readers, SAM text writer, mapping statistics
  index      -- index build (host + device) and reference-format serialization
  sim        -- WGBS read simulator (bit-compatible with `abismal sim`)
  map        -- mapping engines: exact oracle and the TPU device pipeline
  kernels    -- Pallas TPU kernels
  parallel   -- mesh / sharding helpers for multi-chip runs
"""

__version__ = "0.1.0"
