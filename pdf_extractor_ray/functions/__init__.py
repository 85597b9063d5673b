"""Generic Ray-Data operator library: relational analogs of the reference's
read/aggregate API surface (SURVEY.md §2.4-2.7) plus the large-scale
training-data operators (dedup, similarity search, text analysis)."""
