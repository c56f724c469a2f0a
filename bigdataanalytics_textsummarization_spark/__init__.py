"""bigdataanalytics_textsummarization_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference project
``poojithaguntupalli/Bigdataanalytics_TextSummarization`` (two extractive
text-summarization pipelines — LSA and TextRank — plus ROUGE evaluation),
widened into a general DataFrame/SQL analytics engine with
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Everything here is DataFrame/Spark-SQL first: Catalyst handles predicate
pushdown, column pruning and join selection; Python UDFs appear only where
built-in operators genuinely cannot express the semantics (SVD, ROUGE-L LCS,
multimodal decode), and then always as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
