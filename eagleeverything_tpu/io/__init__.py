"""Host-side genotype ingestion and the sharded out-of-core genotype store
(reference: ``ReadMarker`` + the ``createM*``/``ReadBlock`` native layer,
SURVEY.md §3.3 / §4.1). Parsing and block streaming stay on the TPU-VM host
CPUs; only dense numeric tiles ever reach the devices."""
