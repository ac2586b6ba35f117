"""Validation/benchmark tooling for sharkmer-tpu.

System-level validation (network + BLAST dependent, not part of the
unit test suite): runs the pipeline on panel-declared ENA accessions,
checks recovered amplicons against gold references, and writes
markdown + YAML reports. Mirrors the capability surface of the
reference's scripts/sharkmer_validate package.
"""
