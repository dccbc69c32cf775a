"""searchengine_ray — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch rebuild of the query/data-processing capabilities of the CMU
11-642 "QryEval" search engine (reference: Jiaqiang-Ruan/SearchEngine, a
single-threaded Lucene 8.1.1 client), re-expressed Ray-Data-first:

- index build = ``ray.data.read_parquet`` -> zero-copy Arrow ``map_batches``
  tokenization -> ``groupby((field, term, doc_bucket))`` posting merge with
  delta+varbyte compression (SPIMI-style, doc-bucket salting for hot terms)
- query serving = stateful actor pools over the built index evaluating the
  reference's structured query language (#AND #OR #SYN #NEAR/n #WINDOW/n
  #SUM #WAND #WSUM) under UnrankedBoolean / RankedBoolean / BM25 / Indri
- plus the training-data-pipeline operators a 100 TB corpus needs: exact and
  near dedup (MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), ANN
  search, language id, quality scoring, token stats, windowed aggregates.

Nothing here calls ``ray.init``; callers own the Ray session.
"""

__version__ = "0.1.0"
