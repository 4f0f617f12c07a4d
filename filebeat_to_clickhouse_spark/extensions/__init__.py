"""Training-data pipeline operators designed for the 100 TB scale point:

- ``dedup``      — exact + MinHash-LSH + SimHash + n-gram Jaccard dedup
- ``similarity`` — embedding similarity search (brute-force + LSH-bucketed ANN)
- ``text``       — language ID, quality scoring, token stats, fingerprints
- ``multimodal`` — opaque binary payload columns with typed metadata + stub decoders

These have no counterpart in the reference repo (it is a log ETL shim); they
are the driver-mandated north-star extensions. All hot paths are built-in
Catalyst expressions; hashes are md5/sha2 so results are engine-portable and
oracle-checkable.
"""
