from rassengine_tpu.models.bert import BertConfig, BertEncoder, BertForSequenceClassification, BertForTokenClassification

__all__ = [
    "BertConfig",
    "BertEncoder",
    "BertForSequenceClassification",
    "BertForTokenClassification",
]
