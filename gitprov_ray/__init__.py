"""gitprov_ray — a Ray-Data-native provenance knowledge-graph construction engine.

From-scratch re-expression of the capabilities of the reference
``stefan-matcovici/git-prov`` (a single-threaded Java/Spring REST service that
translates GitHub repository history into W3C PROV documents) as a streaming
``ray.data.Dataset`` pipeline over zero-copy Arrow batches, generalized to a
web-scale RDF builder over Common-Crawl-style Parquet page tables
(url, warc_ts, html, text, lang).

Layout:
  idgen.py        deterministic id grammars (SURVEY.md §2.9) + NCName escape
  extract.py      deterministic DOM-pruning HTML→text extractor + event parser
  synth.py        seeded deterministic fixture/corpus generators
  schemas.py      pyarrow schemas for every logical table
  oracle.py       single-threaded reference-semantics emitter (golden oracle)
  stages/         Ray Data map_batches / groupby stages (the engine proper)
  pipelines/      end-to-end pipeline assembly
  store.py        graph-partitioned Parquet triple store (+ manifests)
  serializers.py  N-Triples / Turtle / CSV / TSV / JSON output formats
  sparql_lite.py  BGP (triple-pattern) query compiler over the triples table
  linking.py      MinHash/SimHash/LSH dedup + entity canonicalization
  textops.py      language-ID, quality scoring, token counting, fingerprints
  annsearch.py    embedding similarity search (brute-force + LSH-bucketed)
  queries.py      driver-facing query registry over /root/testdata tables
"""

__version__ = "0.1.0"

# Parallelism is process-level in this engine: every Ray worker runs one
# task at a time, so Arrow's INTERNAL thread pool (sized to all cores by
# default) only oversubscribes the box — measured 13x CPU blowup in the
# dedup-sort reduce at 32 concurrent tasks (1063 CPU-s vs 78 single-task).
# Every worker imports this package to deserialize UDFs, so pinning here
# reaches all of them; the driver process is pinned too (its kernels run
# on tiny data).
import pyarrow as _pa

_pa.set_cpu_count(1)
