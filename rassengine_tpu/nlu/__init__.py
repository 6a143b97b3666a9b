from rassengine_tpu.nlu.intent import IntentClassifier, classify_intent
from rassengine_tpu.nlu.ner import NerPipeline, entities_to_filter, ner_preprocess

__all__ = [
    "IntentClassifier",
    "classify_intent",
    "NerPipeline",
    "ner_preprocess",
    "entities_to_filter",
]
