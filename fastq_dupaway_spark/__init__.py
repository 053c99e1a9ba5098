"""spark-transcript-dedup: PySpark-native near-duplicate detection + clustering
over tables of multi-turn conversation/agent transcripts.

A from-scratch re-imagination of fastq-dupaway (AndrewSigorskih/fastq-dupaway,
C++17 single-node dedup of FASTQ/FASTA reads) as a distributed, Spark-first
pipeline:

- exact dedup          <- reference "tight"/"--fast" modes
- SimHash / Hamming    <- reference "--compare-seq tail-hamming --distance d"
- prefix containment   <- reference "--compare-seq loose"
- MinHash + LSH        <- north-star generalization (no reference analog)
- turn re-sync join    <- reference "--unordered"
- cluster output       <- reference "--write-clusters"

Everything is DataFrame/Catalyst-first; custom kernels are vectorized
pandas/Arrow UDFs. See SURVEY.md for the operator-by-operator mapping.
"""

__version__ = "0.1.0"
