{{ sink(name='user_posts') }}
SELECT
    id,
    userId AS user_id,
    title,
    body,
    current_timestamp() AS loaded_at
FROM {{ use_source('posts') }}
WHERE userId > 5
