"""Ray Data stages of the KG-construction engine.

  pages.py     html parse: pages → extracted text / revision-event rows
  emit.py      stateless statement emitters (+ broadcast agent resolution)
  versions.py  hash-bucketed per-key version-lag shuffle (ST1)
  triples.py   statements → triples, bucketed dedup, global sort, sink
"""
