"""Ray-Data-native knowledge-graph construction engine.

A from-scratch engine with the query/data-processing capabilities of the
OnlpLab/NEMO reference (morpheme-aware NER over ambiguous morphological
lattices, hybrid NER-prunes-morphology flow, mention extraction and
multiset evaluation), generalized into a transcript -> knowledge-graph
pipeline (triple extraction, entity linking, canonicalization, graph
materialization) built on ray.data.Dataset + Arrow batches.

Layout (SURVEY.md section 7.1):
  engine.schema      Arrow schemas for every logical table
  engine.ops.*       pure per-row/per-batch operators (tokenize, BIOSE
                     algebra, lattice build/prune/MD, alignment, spans)
  engine.scorers     deterministic NER scorer actor classes
  engine.link        entity-linking candidate generation (broadcast alias)
  engine.canon       distributed connected-components canonicalization
  engine.triples     relation extraction + triple dedup
  engine.pipeline    the dataset-graph builder (flagship morph_hybrid->KG)
  engine.oracle      single-process pure-Python oracle for P/R testing
  engine.eval        distributed mention/triple multiset P/R harness
  engine.synth       deterministic transcript corpus generator
  engine.queries     Ray implementations of the driver-checked queries
  engine.dedup       exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
  engine.simsearch   brute-force + LSH-bucketed cosine similarity search
  engine.textstats   lang-id, quality scoring, token counts, fingerprints
  engine.windows     rolling/as-of/range temporal window operators
  engine.train       distributed CRF-NLL trainer (structured A8 analog)
  engine.joins       broadcast + packed bucket joins
  engine.shuffle     bucket-sized shuffle partition policy
  engine.multimodal  binary-column media stages (stub decode kernels)
  engine.sources     CoNLL/lattice/JSONL interchange
  engine.docjson     reference Doc-shaped JSON emitter
"""

__version__ = "0.1.0"
