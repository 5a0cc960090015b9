"""Reference workload reproductions (SURVEY.md §7 phase 5): one module
per reference analysis, producing the final data table each figure/
table consumes. These are the domain golden pipelines; inputs are
injected DataFrames (fixtures in tests, real tables in deployment).
"""
