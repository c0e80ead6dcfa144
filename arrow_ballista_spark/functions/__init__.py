"""Function surface: DataFusion-name compatibility mapping
(:mod:`.compat`, 76 scalar + aggregate/window sets) and Arrow-batched
Python UDF/UDAFs (:mod:`.pyudfs`)."""
