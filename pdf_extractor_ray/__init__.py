"""pdf_extractor_ray — a Ray-Data-native main-content extraction engine.

Built from scratch (NOT a port) with the extraction semantics of the
reference ASHUTOSH2224/PDF-Extractor (see /root/repo/SURVEY.md): document
bytes -> per-page extracted text + span metadata, deterministic per
document, expressed as streaming ``ray.data.Dataset`` transforms over
zero-copy Arrow batches with stateful actor pools for the parse kernels.

Layout:
  kernels/    pure ``bytes -> ExtractResult`` functions (stdlib only)
  stages/     Ray Data map_batches stages (sniff, actor-pool extractors, skew split)
  pipelines/  end-to-end pipelines + relational / dedup / similarity / text queries
  state/      per-partition checkpoint manifests (resume lineage)
  functions/  scalar/vector helpers shared by stages and oracles
  corpus.py   deterministic synthetic web-page corpus generator (FIXTURES.md)
  oracle.py   single-process golden-output generator (same kernels, no Ray)
"""

__version__ = "0.1.0"
