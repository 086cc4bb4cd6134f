package graft.ops

/** GENERATED pinned oracles for the mm_* stub decoders (tools/
  * mm_oracle.py: independent python replication of the deterministic
  * byte-level stub math over the sf0.01 parquet files, cross-checked
  * against engine output before pinning). The STUB decode itself stays
  * honestly labeled — these pins verify the Spark plumbing (binaryFile
  * scan, typed mapPartitions batch shape, flatMap framing) end-to-end. */
object MmPins {
  val mmDecode: String = """SELECT file_name, n_bytes::BIGINT AS n_bytes, feat_hash::BIGINT AS feat_hash, fake_width::BIGINT AS fake_width FROM (VALUES
('customer.parquet', 33827, 2139945099420840704, 35),
('documents.parquet', 65049, -1416877405524319891, 537),
('embeddings.parquet', 193638, 8002408642948587583, 102),
('events.parquet', 230821, 2869006058571274488, 421),
('lineitem.parquet', 1039711, -5061779416556487165, 351),
('nation.parquet', 2738, 7701747991738644556, 690),
('orders.parquet', 278780, 346153677431300585, 252),
('part.parquet', 26366, 3717753145539473025, 766),
('region.parquet', 1885, -5956103162704148147, 861),
('supplier.parquet', 5227, -7308599651632700003, 107))
 t(file_name, n_bytes, feat_hash, fake_width) ORDER BY file_name"""

  val mmFrames: String = """SELECT file_name, frame_idx::BIGINT AS frame_idx, frame_bytes::BIGINT AS frame_bytes, frame_checksum::BIGINT AS frame_checksum FROM (VALUES
('customer.parquet', 0, 4096, -8973372099057723853),
('customer.parquet', 1, 1059, -3817988549197503790),
('documents.parquet', 0, 4096, -8115385211394542360),
('documents.parquet', 1, 4096, 8698111935264345574),
('embeddings.parquet', 0, 4096, -2627067665818126706),
('embeddings.parquet', 1, 4096, -6705139721809344843),
('embeddings.parquet', 2, 4096, 2484178394951562468),
('embeddings.parquet', 3, 4096, 4985096424615562014),
('embeddings.parquet', 4, 4096, 5175190103773748227),
('embeddings.parquet', 5, 4096, 1812194957709450501),
('events.parquet', 0, 4096, -6651004557102268133),
('events.parquet', 1, 4096, -2083035618822111308),
('events.parquet', 2, 4096, 4662520429912151582),
('events.parquet', 3, 4096, -2874232962128912185),
('events.parquet', 4, 4096, 4668027086661109638),
('events.parquet', 5, 4096, -6930157068938637997),
('events.parquet', 6, 4096, 6273024246679636769),
('events.parquet', 7, 1445, -1530732774784690136),
('lineitem.parquet', 0, 4096, 5381593351842266530),
('lineitem.parquet', 1, 4096, 7826708043136214684),
('lineitem.parquet', 2, 4096, 8567177717317648127),
('lineitem.parquet', 3, 4096, 7141427427435551246),
('lineitem.parquet', 4, 4096, 3583726037553842007),
('lineitem.parquet', 5, 4096, -3729441401541543603),
('lineitem.parquet', 6, 4096, 4321008586441769634),
('lineitem.parquet', 7, 4096, -7152712901081866150),
('lineitem.parquet', 8, 4096, -3697341999325369250),
('lineitem.parquet', 9, 4096, -613332052258830774),
('lineitem.parquet', 10, 4096, -8360694798239862307),
('lineitem.parquet', 11, 4096, -2354398799199823440),
('lineitem.parquet', 12, 4096, -2105041367130355337),
('lineitem.parquet', 13, 4096, 1554063108209845704),
('lineitem.parquet', 14, 4096, 5079615361794087090),
('lineitem.parquet', 15, 4096, 2659055358539157188),
('lineitem.parquet', 16, 4096, 5316825681930161155),
('lineitem.parquet', 17, 4096, 2382264382260037570),
('lineitem.parquet', 18, 4096, 9094439538825439338),
('lineitem.parquet', 19, 4096, -3757984804650871700),
('lineitem.parquet', 20, 4096, -7239012588655592243),
('lineitem.parquet', 21, 4096, 1018639859573761520),
('lineitem.parquet', 22, 4096, -3813645653588479974),
('lineitem.parquet', 23, 4096, -8456869444044919561),
('lineitem.parquet', 24, 4096, 4569331527497233542),
('lineitem.parquet', 25, 4096, -7147161833844724130),
('lineitem.parquet', 26, 4096, -2902191717004217387),
('lineitem.parquet', 27, 4096, -7422302750583102876),
('lineitem.parquet', 28, 4096, 4973253431843405605),
('lineitem.parquet', 29, 4096, -6224327829910343554),
('lineitem.parquet', 30, 4096, 1019183142758543925),
('lineitem.parquet', 31, 4096, -3465405122142896868),
('nation.parquet', 0, 2738, -8420831551773839165),
('orders.parquet', 0, 4096, 6538531516285093168),
('orders.parquet', 1, 4096, -2083035618822111308),
('orders.parquet', 2, 4096, 7332374724401667031),
('orders.parquet', 3, 4096, -8534600340761844082),
('orders.parquet', 4, 4096, -8967133105970360244),
('orders.parquet', 5, 4096, -5265593307592749559),
('orders.parquet', 6, 4096, 5963402247005507450),
('orders.parquet', 7, 4096, 8223049296069708653),
('orders.parquet', 8, 4096, -7577444314419504047),
('part.parquet', 0, 4096, 7282733408485985704),
('region.parquet', 0, 1885, 7385420222274004994),
('supplier.parquet', 0, 4096, 278992459589643916))
 t(file_name, frame_idx, frame_bytes, frame_checksum) ORDER BY file_name, frame_idx"""

  val mmResize: String = """SELECT file_name, width::INT AS width, height::INT AS height, thumb_bytes::BIGINT AS thumb_bytes, thumb_checksum::BIGINT AS thumb_checksum FROM (VALUES
('customer.parquet', 16, 16, 256, -7027168840204906383),
('documents.parquet', 16, 16, 256, 6977728723292269664),
('embeddings.parquet', 16, 16, 256, -4505399569475433182),
('events.parquet', 16, 16, 256, 666569605260036001),
('lineitem.parquet', 16, 16, 256, 1134270103652945011),
('nation.parquet', 16, 16, 256, -3388931133084189873),
('orders.parquet', 16, 16, 256, -4762676697178418940),
('part.parquet', 16, 16, 256, 7593494240173076360),
('region.parquet', 16, 16, 256, 7585856898615386671),
('supplier.parquet', 16, 16, 256, -2669299924080542897))
 t(file_name, width, height, thumb_bytes, thumb_checksum) ORDER BY file_name"""
}
