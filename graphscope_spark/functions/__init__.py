"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal plumbing. All hot paths use built-in
pyspark.sql.functions (JVM-side, whole-stage codegen); pandas UDFs only
where SQL genuinely cannot express the kernel (simhash bit mixing,
binary payload decode)."""
