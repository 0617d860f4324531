"""Column names, training-kind codes, and data-type tags.

Capability parity with reference constants.py:1-48 (vestigial min-hash /
per-word-column constants intentionally not rebuilt, per SURVEY.md §2.1).
"""

# Dataframe column names
COLUMN_WORDS = "words"
COLUMN_TITLE_ID = "title_id"
COLUMN_TITLE = "title"
COLUMN_TRANSFORMED_TITLE = "transformed_title"
COLUMN_NUMBER_OF_WORDS = "number_of_words"
COLUMN_N_GRAMS = "n_grams"

COLUMN_TEST_INDEX = "test_index"
COLUMN_TRAIN_INDEX = "train_index"
COLUMN_GENERATED_MISSPELLED_TITLE = "generated_misspelled_title"
COLUMN_TARGET = "target"
COLUMN_TRAIN_KIND = "kind"

COLUMN_MATCH_TITLE_ID = "match_title_id"
COLUMN_MATCH_TRANSFORMED_TITLE = "match_transformed_title"
COLUMN_LEVENSHTEIN_RATIO = "levenshtein_ratio"
COLUMN_PREDICTION = "prediction"

# Training-pair provenance codes (reference constants.py:39-41)
TRAINING_KIND_GENERATED = 1
TRAINING_KIND_NEGATIVE = 2
TRAINING_KIND_POSITIVE = 3

# Data-type tags for pipeline entry points (reference constants.py:43-46)
DATA_TYPE_TRAIN = "type_train"
DATA_TYPE_TEST = "type_test"
DATA_TYPE_SINGLE = "type_single"
