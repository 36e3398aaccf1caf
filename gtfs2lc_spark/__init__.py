"""gtfs2lc_spark — a from-scratch PySpark-native Linked Connections
knowledge-graph construction engine.

Re-expresses the query/data semantics of linkedconnections/gtfs2lc
(reference at /root/reference, v2.4.0, Node.js streaming engine) as
idiomatic Spark DataFrame algebra, designed for 100 TB-scale inputs:

- Layer A (``extraction``): Common-Crawl-style web pages
  ``(url, warc_ts, html, text, lang)`` -> per-entity GTFS tables via a
  vectorized pandas UDF detector (pure function of ``text``).
- Layer B (``pipeline``): stop_times lag-window pairing, broadcast
  dimension joins, calendar service-day expansion + explode, timestamp
  construction with DST-correct epoch arithmetic, URI-template
  canonicalization, and (subj, pred, obj) triple materialization.
- ``checkpoint``: resumable differential conversion (history anti-join)
  with per-partition lineage + metrics (reference: history.db,
  lib/stoptimes/st2c.js:134-181).
- ``postprocess``: join/split-trip movement merge and nextConnection
  linking (reference: bin/linkedconnections-sort.js).
- ``datapipe``: large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) beyond the reference.
"""

__version__ = "0.1.0"

FEED_TIMEZONE_DEFAULT = "Europe/Brussels"

LC = "http://semweb.mmlab.be/ns/linkedconnections#"
GTFS = "http://vocab.gtfs.org/terms#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# reference: lib/Connections2Triples.js:14-19
BOARDING_TYPES = [
    f"{GTFS}Regular",
    f"{GTFS}NotAvailable",
    f"{GTFS}MustPhone",
    f"{GTFS}MustCoordinateWithDriver",
]
