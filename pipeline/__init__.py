"""PySpark-native record-linkage (entity-resolution) pipeline.

A from-scratch, DataFrame-first rebuild of the capabilities of the reference
system ``TAIntern/Address_Address_matching`` (see SURVEY.md), applied to
multi-turn conversation transcripts:

    canonicalize -> normalize -> features -> blocking -> pairwise scoring
    -> tier cascade -> transitive clustering (connected components)
    -> audit / evaluation

All stages are declarative DataFrame plans (Catalyst-optimized, whole-stage
codegen where possible); Python appears only inside Arrow-batched pandas UDFs
for the string-similarity kernels (reference semantics: rapidfuzz-style
InDel ratio et al., reimplemented self-contained in ``pipeline.kernels``).
"""

__version__ = "0.1.0"
