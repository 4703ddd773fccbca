package graft.enrich

import graft.extract.Json
import graft.extract.Json._
import graft.net.{HttpTransport, JdkHttpTransport}

/** The Nominatim-shaped geocoder client (geocoder.py:96-210) — the REAL
  * exchange: `GET {base}?q=<query>, Taiwan&format=json&limit=1&
  * addressdetails=1`, a JSON-array response whose first element carries
  * `lat`/`lon` (as strings) and `display_name`, and the reference's
  * fallback LADDER: cleaned address → street-level (house number dropped)
  * → city+district → city.
  *
  * No network in this container, so GeoSpec drives it over a
  * [[graft.net.RecordedTransport]] capture (including a ladder replay);
  * production passes a [[graft.net.JdkHttpTransport]] against a live
  * Nominatim. The 1-QPS budget is enforced batch-side by
  * [[Geo.throttleMisses]] (the Redis `SET NX EX 1` lock re-expressed at
  * round grain), not per-call sleeps.
  */
final class NominatimClient(transport: HttpTransport,
                            baseUrl: String = "https://nominatim.openstreetmap.org/search") {

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** One `_do_request` (geocoder.py:163-210): None on no result / non-200 /
    * malformed body.
    */
  def geocode(query: String): Option[(Double, Double, String)] = {
    if (query == null || query.isEmpty) return None
    val searchQuery = if (query.contains("Taiwan")) query else s"$query, Taiwan"
    val url = s"$baseUrl?q=${enc(searchQuery)}&format=json&limit=1&addressdetails=1"
    try {
      val resp = transport.send("GET", url, None)
      if (resp.status != 200) None
      else Json.parse(resp.body) match {
        case JArr(first +: _) => first match {
          case o: JObj =>
            for {
              lat <- o.get("lat").map(pyStr).flatMap(_.toDoubleOption)
              lon <- o.get("lon").map(pyStr).flatMap(_.toDoubleOption)
            } yield (lat, lon, o.get("display_name").map(pyStr).getOrElse(""))
          case _ => None
        }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The full fallback ladder (geocoder.py:124-152) over an ALREADY-CLEANED
    * address (batch cleaning is [[Geo.cleanAddress]], certified by the g1
    * oracle): full → street level → city+district → city.
    */
  def resolve(cleanAddr: String, city: Option[String] = None,
              district: Option[String] = None): Option[(Double, Double, String)] = {
    if (cleanAddr == null || cleanAddr.isEmpty) return None
    geocode(cleanAddr)
      .orElse {
        val street = "(.*?[路街巷大道段])".r.findFirstMatchIn(cleanAddr)
          .map(m => graft.extract.Py.strip(m.group(1)))
        street.filter(s => s.nonEmpty && s != cleanAddr).flatMap(geocode)
      }
      .orElse {
        val fb = graft.extract.Py.strip(city.getOrElse("") + district.getOrElse(""))
        Option(fb).filter(s => s.nonEmpty && s != cleanAddr).flatMap(geocode)
      }
      .orElse(city.filter(_.nonEmpty).flatMap(geocode))
  }
}

object NominatimClient {
  def live(baseUrl: String = "https://nominatim.openstreetmap.org/search"): NominatimClient =
    new NominatimClient(new JdkHttpTransport(), baseUrl)
}
