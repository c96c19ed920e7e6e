"""ecostream — a PySpark-native analytics engine with the query and
data-processing capabilities of camiloperez77/Simulacion_Ecosistema.

The reference (/root/reference) is a Kafka producer/consumer pair with an
in-memory dict store and a suite of client-side big-data algorithms
(Bloom filter, HyperLogLog, DGIM, MinHash, MapReduce word-count, habitat
graph + random walks, Markov-chain analysis).  This package re-expresses
every one of those capabilities Spark-first: declarative DataFrame/SQL
plans optimized by Catalyst, Structured Streaming for the ingest path,
and Pandas UDFs only where built-ins genuinely cannot express the
semantics.

Layout
------
- ``schema``      canonical event schema + parquet table loaders
- ``session``     SparkSession builder tuned for the target workload
- ``generator``   seeded synthetic insect-event generator (SURVEY S1)
- ``queries``     the operator inventory (SURVEY §2) as declared queries
- ``streaming``   Structured Streaming ingest/window/state (SURVEY §2.10)
- ``functions``   shared column expression helpers (hashing, geo, text)
- ``markov_analysis``  driver-local DTMC classification (SURVEY M4)
- ``multimodal``  binary-column (image/audio) plumbing with stub decoders
"""

__version__ = "0.1.0"
