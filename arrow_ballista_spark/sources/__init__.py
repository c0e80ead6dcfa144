"""Sources/sinks: file-format readers (:mod:`.readers`), partitioned
writers (:mod:`.writers`), pure-Python DataSource V2 provider
(:mod:`.python_datasource`)."""
