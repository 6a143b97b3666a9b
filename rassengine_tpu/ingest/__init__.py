from rassengine_tpu.ingest.chunker import chunk_text
from rassengine_tpu.ingest.fhir import parse_fhir_bundle, parse_fhir_bundle_with_path
from rassengine_tpu.ingest.textfile import (
    infer_patient_id_from_filename,
    parse_markdown_file,
    parse_text_file,
)

__all__ = [
    "chunk_text",
    "parse_fhir_bundle",
    "parse_fhir_bundle_with_path",
    "parse_text_file",
    "parse_markdown_file",
    "infer_patient_id_from_filename",
]
