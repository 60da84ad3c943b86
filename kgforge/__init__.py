"""kgforge — a PySpark-native knowledge-graph construction engine.

From-scratch re-expression of the capabilities of the reference ETL
(ARCH-commons/i2p-transform, read-only at /root/reference): an
ontology-driven schema-mapping pipeline recast as triple emission over
Common-Crawl-style web pages.

Pipeline stages (SURVEY.md §7.0):

    pages (url, warc_ts, html, text, lang)
      -> extract   (vectorized Arrow UDF html->text, byte-identical per url)
      -> mentions  (batched dictionary mention detection)
      -> link      (broadcast concept-dictionary scoring; the analog of the
                    reference's fact JOIN ontology ON concept_cd=c_basecode,
                    Oracle/PCORNetLoader_ora.sql:1499)
      -> canon     (MinHash blocking -> similarity edges -> connected
                    components; generalizes the reference's recursive-CTE
                    ontology walk, MSSQL/PCORI_MEDS_SCHEMA_CHANGE.sql:34-54)
      -> emit      (per-predicate triple emitters; the 13 PCORNetXxx analogs)
      -> metrics   (i2pReport reconciliation analog,
                    Oracle/PCORNetLoader_ora.sql:2451-2565)

Everything is DataFrame/SQL + Arrow-vectorized UDFs; no per-row Python.
"""

__version__ = "0.1.0"
