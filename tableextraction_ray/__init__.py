"""tableextraction_ray — a Ray-Data-native table-extraction engine.

A from-scratch reimplementation of the data-processing capabilities of
DikovAlexandr/TableExtraction (reference at /root/reference, cited per-module
as ``path:line``), re-expressed as a streaming ``ray.data.Dataset`` pipeline:

    read(documents) -> explode spans -> decode pages -> detect tables
        -> grid cells -> OCR -> groupby(doc_id).map_groups(assemble)

The input/output data model is the interleaved-document schema::

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string,
                        offset: int32>>

The per-row invariant versus the reference is span-sequence equality on
``(kind, text, media_ref, order)``.
"""

__version__ = "0.1.0"
