"""Data-pipeline operators beyond the reference's relational surface.

The reference is a pure batch SQL engine; a 100 TB training-data
pipeline additionally needs dedup, similarity search, text analysis
and multimodal-column plumbing. Everything here is expressed as
DataFrame compositions (JVM-side, shuffle-conscious); Pandas UDFs only
where arrays/binary genuinely need Python (multimodal, LSH planes).
"""
