"""Pipeline stages: vectorized ``map_batches`` transforms and actor-pool
stateful stages. Every stage is Arrow-in / Arrow-out
(``batch_format="pyarrow"``, ``zero_copy_batch=True``)."""
