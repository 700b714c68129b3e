package graft.sources.proto

/** The OpenRTB-style Bidrequest message tree, mirroring the reference's
  * input data model `/root/reference/proto/bidrequest.proto:7-347` (all
  * 22 message types, same field names and numbers — the wire format is
  * the interoperability contract). The Spark `StructType` is derived via
  * [[ProtoSchema.toStructType]], replacing the reference's
  * bufarrow proto→Arrow schema autogeneration (main.go:203,214).
  */
object BidRequestSchema {

  private def f(n: Int, name: String, t: PType) = PField(n, name, t)
  private def rep(n: Int, name: String, t: PType) =
    PField(n, name, t, repeated = true)

  // google.protobuf.Timestamp (bidrequest.proto:5,28) — stored as a
  // struct {seconds, nanos}, NOT a native timestamp (SURVEY §1.3).
  val timestamp: PMessage = PMessage("Timestamp", Seq(
    f(1, "seconds", PInt64), f(2, "nanos", PInt32)))

  val segment: PMessage = PMessage("Segment", Seq(
    f(1, "id", PString), f(2, "name", PString), f(3, "value", PString)))

  val data: PMessage = PMessage("Data", Seq(
    f(1, "id", PString), f(2, "name", PString), rep(3, "segment", segment)))

  val geo: PMessage = PMessage("Geo", Seq(
    f(1, "lat", PFloat), f(2, "lon", PFloat), f(3, "type", PInt32),
    f(4, "accuracy", PInt32), f(5, "lastfix", PInt32),
    f(6, "ipservice", PInt32), f(7, "country", PString),
    f(8, "region", PString), f(9, "regionfips104", PString),
    f(10, "metro", PString), f(11, "city", PString), f(12, "zip", PString),
    f(13, "utcoffset", PInt32)))

  val producer: PMessage = PMessage("Producer", Seq(
    f(1, "id", PString), f(2, "name", PString), rep(3, "cat", PString),
    f(4, "domain", PString)))

  val content: PMessage = PMessage("Content", Seq(
    f(1, "id", PString), f(2, "episode", PInt32), f(3, "title", PString),
    f(4, "series", PString), f(5, "season", PString), f(6, "artist", PString),
    f(7, "genre", PString), f(8, "album", PString), f(9, "isrc", PString),
    f(10, "producer", producer), f(11, "url", PString),
    rep(12, "cat", PString), f(13, "prodq", PInt32), f(14, "context", PInt32),
    f(15, "contentrating", PString), f(16, "userrating", PString),
    f(17, "qagmediarating", PInt32), f(18, "keywords", PString),
    f(19, "livestream", PInt32), f(20, "sourcerelationship", PInt32),
    f(21, "len", PInt32), f(22, "language", PString),
    f(23, "embeddable", PInt32), rep(24, "data", data)))

  val publisher: PMessage = PMessage("Publisher", Seq(
    f(1, "id", PString), f(2, "name", PString), rep(3, "cat", PString),
    f(4, "domain", PString)))

  val site: PMessage = PMessage("Site", Seq(
    f(1, "id", PString), f(2, "name", PString), f(3, "domain", PString),
    rep(4, "cat", PString), rep(5, "sectioncat", PString),
    rep(6, "pagecat", PString), f(7, "page", PString), f(8, "ref", PString),
    f(9, "search", PString), f(10, "mobile", PInt32),
    f(11, "privacypolicy", PInt32), f(12, "publisher", publisher),
    f(13, "content", content), f(14, "keywords", PString)))

  val app: PMessage = PMessage("App", Seq(
    f(1, "id", PString), f(2, "name", PString), f(3, "bundle", PString),
    f(4, "domain", PString), f(5, "storeurl", PString),
    rep(6, "cat", PString), rep(7, "sectioncat", PString),
    rep(8, "pagecat", PString), f(9, "ver", PString),
    f(10, "privacypolicy", PInt32), f(11, "paid", PInt32),
    f(12, "publisher", publisher), f(13, "content", content),
    f(14, "keywords", PString)))

  val device: PMessage = PMessage("Device", Seq(
    f(1, "ua", PString), f(2, "geo", geo), f(3, "dnt", PInt32),
    f(4, "lmt", PInt32), f(5, "ip", PString), f(6, "ipv6", PString),
    f(7, "devicetype", PInt32), f(8, "make", PString), f(9, "model", PString),
    f(10, "os", PString), f(11, "osv", PString), f(12, "hwv", PString),
    f(13, "h", PInt32), f(14, "w", PInt32), f(15, "ppi", PInt32),
    f(16, "pxratio", PFloat), f(17, "js", PInt32), f(18, "geofetch", PInt32),
    f(19, "flashver", PString), f(20, "language", PString),
    f(21, "carrier", PString), f(22, "mccmnc", PString),
    f(23, "connectiontype", PInt32), f(24, "ifa", PString),
    f(25, "didsha1", PString), f(26, "didmd5", PString),
    f(27, "dpidsha1", PString), f(28, "dpidmd5", PString),
    f(29, "macsha1", PString), f(30, "macmd5", PString)))

  val user: PMessage = PMessage("User", Seq(
    f(1, "id", PString), f(2, "buyeruid", PString), f(3, "yob", PInt32),
    f(4, "gender", PString), f(5, "keywords", PString),
    f(6, "customdata", PString), f(7, "geo", geo), rep(8, "data", data)))

  val format: PMessage = PMessage("Format", Seq(
    f(1, "w", PInt32), f(2, "h", PInt32), f(3, "wratio", PInt32),
    f(4, "hratio", PInt32), f(5, "wmin", PInt32)))

  val banner: PMessage = PMessage("Banner", Seq(
    rep(1, "format", PString), f(2, "w", PInt32), f(3, "h", PInt32),
    rep(4, "btype", PInt32), rep(5, "battr", PInt32), f(6, "pos", PInt32),
    rep(7, "mimes", PString), f(8, "topframe", PInt32),
    rep(9, "expdir", PInt32), rep(10, "api", PInt32), f(11, "id", PString),
    f(12, "vcm", PInt32)))

  val video: PMessage = PMessage("Video", Seq(
    rep(1, "mimes", PString), f(2, "minduration", PInt32),
    f(3, "maxduration", PInt32), rep(4, "protocols", PInt32),
    f(5, "w", PInt32), f(6, "h", PInt32), f(7, "startdelay", PInt32),
    f(8, "placement", PInt32), f(9, "linearity", PInt32),
    f(10, "skip", PInt32), f(11, "skipmin", PInt32),
    f(12, "skipafter", PInt32), f(13, "sequence", PInt32),
    rep(14, "battr", PInt32), f(15, "maxextended", PInt32),
    f(16, "minbitrate", PInt32), f(17, "maxbitrate", PInt32),
    f(18, "boxingallowed", PInt32), rep(19, "playbackmethod", PInt32),
    f(20, "playbackend", PInt32), rep(21, "delivery", PInt32),
    f(22, "pos", PInt32), rep(23, "companionad", banner),
    rep(24, "api", PInt32), rep(25, "companiontype", PInt32)))

  val audio: PMessage = PMessage("Audio", Seq(
    rep(1, "mimes", PString), f(2, "minduration", PInt32),
    f(3, "maxduration", PInt32), rep(4, "protocols", PInt32),
    f(5, "startdelay", PInt32), f(6, "sequence", PInt32),
    rep(7, "battr", PInt32), f(8, "maxextended", PInt32),
    f(9, "minbitrate", PInt32), f(10, "maxbitrate", PInt32),
    rep(11, "delivery", PInt32), rep(12, "companionad", banner),
    rep(13, "api", PInt32), rep(14, "companiontype", PInt32),
    f(15, "maxseq", PInt32), f(16, "feed", PInt32),
    f(17, "stitched", PInt32), f(18, "nvol", PInt32)))

  val native: PMessage = PMessage("Native", Seq(
    f(1, "request", PString), f(2, "ver", PString), rep(3, "api", PInt32),
    rep(4, "battr", PInt32)))

  val metric: PMessage = PMessage("Metric", Seq(
    f(1, "type", PString), f(2, "value", PFloat), f(3, "vendor", PString)))

  val deal: PMessage = PMessage("Deal", Seq(
    f(1, "id", PString), f(2, "bidfloor", PFloat),
    f(3, "bidfloorcur", PString), f(4, "at", PInt32),
    rep(5, "wseat", PString), rep(6, "wadomain", PString)))

  val pmp: PMessage = PMessage("Pmp", Seq(
    f(1, "private_auction", PInt32), rep(2, "deals", deal)))

  val imp: PMessage = PMessage("Imp", Seq(
    f(1, "id", PString), rep(2, "metric", metric), f(3, "banner", banner),
    f(4, "video", video), f(5, "audio", audio), f(6, "native", native),
    f(7, "pmp", pmp), f(8, "displaymanager", PString),
    f(9, "displaymanagerver", PString), f(10, "instl", PInt32),
    f(11, "tagid", PString), f(12, "bidfloor", PFloat),
    f(13, "bidfloorcur", PString), f(14, "clickbrowser", PInt32),
    f(15, "secure", PInt32), rep(16, "iframebuster", PString),
    f(17, "exp", PInt32)))

  val source: PMessage = PMessage("Source", Seq(
    f(1, "fd", PInt32), f(2, "tid", PString), f(3, "pchain", PString)))

  val regs: PMessage = PMessage("Regs", Seq(f(1, "coppa", PInt32)))

  val bidrequest: PMessage = PMessage("Bidrequest", Seq(
    f(1, "id", PString), rep(2, "imp", imp), f(3, "site", site),
    f(4, "app", app), f(5, "device", device), f(6, "user", user),
    f(7, "test", PInt32), f(8, "at", PInt32), f(9, "tmax", PInt32),
    rep(10, "wseat", PString), rep(11, "bseat", PString),
    f(12, "allimps", PInt32), rep(13, "cur", PString),
    rep(14, "wlang", PString), rep(15, "bcat", PString),
    rep(16, "badv", PString), rep(17, "bapp", PString),
    f(18, "source", source), f(19, "regs", regs),
    f(20, "timestamp", timestamp)))
}
