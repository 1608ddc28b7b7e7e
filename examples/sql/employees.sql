{{ sink(name='employees') }}
SELECT * FROM {{ use_source('employees') }}
