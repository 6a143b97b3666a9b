from rassengine_tpu.utils.files import retrieve_ehr_document, validate_file_path

__all__ = ["validate_file_path", "retrieve_ehr_document"]
