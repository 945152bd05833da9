"""tomahawk_tpu: a TPU-native linkage-disequilibrium (LD) engine.

A from-scratch reimplementation of the capabilities of mklarqvist/tomahawk
(population-scale pairwise LD from diploid genotype data) designed for TPU
hardware: genotypes are imported into bit/RLE-packed archives, unpacked into
one-hot sample planes, and the all-vs-all pairwise contingency tables are
computed as int8/bf16 matmuls on the MXU (JAX/XLA/Pallas), with vectorized
D/D'/r2/chi2/Fisher statistics and a sharded upper-triangular tile grid for
multi-chip / multi-host scale-out.

File formats are byte-compatible with the reference implementation
(.twk / .two / .twa containers; reference: /root/reference include/core.h,
include/tomahawk.h) so outputs can be cross-validated field by field.
"""

__version__ = "0.1.0"

VERSION_MAJOR = 0
VERSION_MINOR = 1
VERSION_PATCH = 0

PROGRAM_NAME = "tomahawk_tpu"
