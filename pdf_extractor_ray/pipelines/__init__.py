"""End-to-end pipelines (flagship extraction) + query libraries
(relational / dedup / similarity / text analysis) exposed to the driver via
``__ray_entry__.py``."""
